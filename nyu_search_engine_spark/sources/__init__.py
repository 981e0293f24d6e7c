from . import corpus, index_io  # noqa: F401
