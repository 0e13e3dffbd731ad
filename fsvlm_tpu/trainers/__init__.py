from .cocoop import CoCoOp  # noqa: F401 (registration side effects)
from .coop import CoOp  # noqa: F401
from .ivlp import IVLP  # noqa: F401
from .linear_probe import LinearProbeCLIP  # noqa: F401
from .lora import LoRA  # noqa: F401
from .maple import MaPLe  # noqa: F401
from .plip import PLIP  # noqa: F401
from .promptsrc import PromptSRC  # noqa: F401
from .zsclip import ZeroshotCLIP, ZeroshotCLIP2  # noqa: F401
from . import zoo  # noqa: F401 (DA/DG/SSL trainer registration)
