from . import htmlkit, urlkit  # noqa: F401
