from . import cellid, pip, strtree, window  # noqa: F401
