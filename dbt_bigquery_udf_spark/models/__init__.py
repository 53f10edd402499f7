from .core import Engine, ModelSpec  # noqa: F401
from .reference import REFERENCE_MODELS  # noqa: F401
