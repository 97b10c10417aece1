from .base import CursorSpec, ResourceDescriptor, WriteDisposition
from .files import FileResource
from .python_source import python_resource

__all__ = [
    "CursorSpec",
    "ResourceDescriptor",
    "WriteDisposition",
    "FileResource",
    "python_resource",
]
