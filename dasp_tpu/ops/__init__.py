from . import dd, xla_backend  # noqa: F401
