from .checkpoint import load_checkpoint, resume_from_checkpoint, save_checkpoint
from .distance import compute_distance_matrix, cosine_distance, euclidean_squared_distance
from .evaluator import EVALUATOR_REGISTRY, Classification, build_evaluator, compute_accuracy
from .optim import build_optimizer, make_lr_schedule
from .trainer import TRAINER_REGISTRY, SimpleTrainer, TrainerX, build_trainer
