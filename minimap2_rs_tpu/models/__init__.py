from .mapper import Mapper  # noqa: F401
