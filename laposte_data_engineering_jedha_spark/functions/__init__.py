from . import exprs  # noqa: F401
