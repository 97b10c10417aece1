from .base import CursorSpec, ResourceDescriptor, WriteDisposition
from .dbapi import DbApiResource
from .files import FileResource
from .python_source import python_resource

__all__ = [
    "CursorSpec",
    "ResourceDescriptor",
    "WriteDisposition",
    "DbApiResource",
    "FileResource",
    "python_resource",
]
