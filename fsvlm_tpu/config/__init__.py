from .cfgnode import CfgNode
from .defaults import get_cfg_default
