from . import bm25, tokenize, varbyte  # noqa: F401
