from .shape import build_ref_docs, shape_documents, validate_documents

__all__ = ["shape_documents", "validate_documents", "build_ref_docs"]
