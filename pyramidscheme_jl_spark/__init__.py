"""PySpark-native raster-pyramid + spatial-join engine (see README.md).

Public surface re-exported here so a user of the reference can start with
``from pyramidscheme_jl_spark import PyramidDataset, get_spark`` and find
every operator family one import away.
"""

from .api import PyramidDataset
from .session import get_spark, package_zip

__all__ = [
    "PyramidDataset",
    "get_spark",
    "package_zip",
]
