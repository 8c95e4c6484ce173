from . import embed, text  # noqa: F401
