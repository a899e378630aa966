from . import boxes, nms, roi_align  # noqa: F401
