from .geo import cluster_by_geo, cluster_by_name, geo_cell, geohash, with_geo_cell
from .shape import build_ref_docs, shape_documents, validate_documents

__all__ = [
    "shape_documents",
    "validate_documents",
    "build_ref_docs",
    "geo_cell",
    "geohash",
    "with_geo_cell",
    "cluster_by_geo",
    "cluster_by_name",
]
