from . import pyramid, blur, fast, orientation, brief, octree, extractor  # noqa: F401
