from . import cellid, pip, simplify, strtree, window  # noqa: F401
