from . import legacy, recognition, synthetic  # noqa: F401  (registration side effects)
from ..base_dataset import DatasetBase, Datum
from ..data_manager import DATASET_REGISTRY
