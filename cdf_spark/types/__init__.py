from .arrow_types import MappedType, TypeMappingFidelity, parse_arrow_type
from .schema import CanonicalField, CanonicalSchema, schema_fingerprint

__all__ = [
    "MappedType",
    "TypeMappingFidelity",
    "parse_arrow_type",
    "CanonicalField",
    "CanonicalSchema",
    "schema_fingerprint",
]
