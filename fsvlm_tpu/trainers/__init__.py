from .coop import CoOp  # noqa: F401 (registration side effects)
from .ivlp import IVLP  # noqa: F401
from .promptsrc import PromptSRC  # noqa: F401
