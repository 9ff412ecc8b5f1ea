"""Sources & sinks: lakehouse table loaders, GeoJSON/GeoParquet ingest."""
