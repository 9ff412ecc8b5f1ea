"""Wire-format serializers: GeoJSON, Esri JSON, Esri PBF, GeoArrow IPC,
GeoParquet. Row-level conversion runs distributed (to_json / UDF kernels);
only the final envelope assembly happens on the driver."""
