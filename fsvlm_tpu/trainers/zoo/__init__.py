"""DA/DG/SSL trainer zoo (Dassl.pytorch/dassl/engine/{da,dg,ssl} rebuilt
TPU-native).  Importing this package registers every zoo trainer."""

from . import da, dg, ssl  # noqa: F401
