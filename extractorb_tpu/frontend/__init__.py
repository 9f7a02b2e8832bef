from . import pyramid, blur, fast, orientation, brief, octree, extractor, matcher  # noqa: F401
