"""Default config schema.

Mirrors the union of dassl/config/defaults.py (the keys the CLIP path reads)
and the fork's app-side extensions (PromptSRC/train.py:88-195), with all keys
the shipped code reads but never defines added with sane defaults — documented
divergence from the reference, which crashes on TRAINER.PROMPTSRC.USE_GPA /
LOGITS_LOSS_WEIGHT and TRAINER.LORA.*_LOSS_WEIGHT (SURVEY.md §5.6).
"""

from .cfgnode import CfgNode as CN


def get_cfg_default():
    _C = CN()
    _C.VERSION = 1
    _C.OUTPUT_DIR = "./output"
    _C.RESUME = ""
    _C.SEED = -1
    _C.USE_CUDA = True  # kept for config compatibility; ignored (device = TPU/JAX backend)
    _C.VERBOSE = True

    # ------------------------------------------------------------------ input
    _C.INPUT = CN()
    _C.INPUT.SIZE = (224, 224)
    _C.INPUT.INTERPOLATION = "bilinear"
    _C.INPUT.TRANSFORMS = ()
    _C.INPUT.NO_TRANSFORM = False
    _C.INPUT.PIXEL_MEAN = [0.485, 0.456, 0.406]
    _C.INPUT.PIXEL_STD = [0.229, 0.224, 0.225]
    _C.INPUT.CROP_PADDING = 4
    _C.INPUT.RRCROP_SCALE = (0.08, 1.0)
    _C.INPUT.CUTOUT_N = 1
    _C.INPUT.CUTOUT_LEN = 16
    _C.INPUT.GN_MEAN = 0.0
    _C.INPUT.GN_STD = 0.15
    _C.INPUT.RANDAUGMENT_N = 2
    _C.INPUT.RANDAUGMENT_M = 10
    _C.INPUT.COLORJITTER_B = 0.4
    _C.INPUT.COLORJITTER_C = 0.4
    _C.INPUT.COLORJITTER_S = 0.4
    _C.INPUT.COLORJITTER_H = 0.1
    _C.INPUT.RGS_P = 0.2
    _C.INPUT.GB_P = 0.5
    _C.INPUT.GB_K = 21

    # ---------------------------------------------------------------- dataset
    _C.DATASET = CN()
    _C.DATASET.ROOT = ""
    _C.DATASET.NAME = ""
    _C.DATASET.SOURCE_DOMAINS = ()
    _C.DATASET.TARGET_DOMAINS = ()
    _C.DATASET.NUM_LABELED = -1
    _C.DATASET.NUM_SHOTS = -1
    _C.DATASET.VAL_PERCENT = 0.1
    _C.DATASET.ALL_AS_UNLABELED = False
    # legacy zoo keys (dassl defaults.py:76-88)
    _C.DATASET.STL10_FOLD = -1
    _C.DATASET.CIFAR_C_TYPE = ""
    _C.DATASET.CIFAR_C_LEVEL = 1
    # fork keys
    _C.DATASET.SUBSAMPLE_CLASSES = "all"  # all, base or new
    _C.DATASET.PER_CLASS_SHOTS = []  # used when NUM_SHOTS < 0 (imbalanced protocol)

    # ------------------------------------------------------------- dataloader
    _C.DATALOADER = CN()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.K_TRANSFORMS = 1
    _C.DATALOADER.RETURN_IMG0 = False
    # TPU extension: ship uint8 once and fuse random-resized-crop/flip/
    # normalize into the jitted train step (fsvlm_tpu.ops.preprocess);
    # PRE_SIZE is the host-side cache resolution
    _C.DATALOADER.DEVICE_AUG = False
    _C.DATALOADER.PRE_SIZE = 256
    # TPU extension: keep the (tiny) few-shot train set resident in HBM as
    # one uint8 array and gather batches on device by index — per-step H2D
    # shrinks from B*P*P*3 bytes to a handful of int32s.  "auto" enables it
    # whenever DEVICE_AUG is on and the set fits the MB budget; "on"
    # forces (errors if ineligible), "off" disables.
    _C.DATALOADER.DEVICE_RESIDENT = "auto"
    _C.DATALOADER.DEVICE_RESIDENT_BUDGET_MB = 2048
    _C.DATALOADER.TRAIN_X = CN()
    _C.DATALOADER.TRAIN_X.SAMPLER = "RandomSampler"
    _C.DATALOADER.TRAIN_X.BATCH_SIZE = 32
    _C.DATALOADER.TRAIN_X.N_DOMAIN = 0
    _C.DATALOADER.TRAIN_X.N_INS = 16
    _C.DATALOADER.TRAIN_U = CN()
    _C.DATALOADER.TRAIN_U.SAME_AS_X = True
    _C.DATALOADER.TRAIN_U.SAMPLER = "RandomSampler"
    _C.DATALOADER.TRAIN_U.BATCH_SIZE = 32
    _C.DATALOADER.TRAIN_U.N_DOMAIN = 0
    _C.DATALOADER.TRAIN_U.N_INS = 16
    _C.DATALOADER.TEST = CN()
    _C.DATALOADER.TEST.SAMPLER = "SequentialSampler"
    _C.DATALOADER.TEST.BATCH_SIZE = 32

    # ------------------------------------------------------------------ model
    _C.MODEL = CN()
    _C.MODEL.INIT_WEIGHTS = ""
    # TPU extension: trim prompt sequences to the last EOT (exact under the
    # causal mask; ~4x fewer text-tower FLOPs for typical class names)
    _C.MODEL.TEXT_TRUNCATE = True
    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = ""
    _C.MODEL.BACKBONE.PRETRAINED = True
    # frozen-tower storage dtype: fp32 (the fork's behavior) or bf16
    # (upstream CLIP ships fp16 weights; bf16 halves weight HBM reads)
    _C.MODEL.FROZEN_DTYPE = "fp32"
    # TPU extension: serve the frozen image tower's GEMMs in int8 (W8A8,
    # MXU int8 = 2x bf16 peak).  Serving/no-grad paths only (ZeroshotCLIP,
    # trainer.test()); see fsvlm_tpu/ops/quant.py
    _C.MODEL.QUANT_INT8 = False
    # which GEMM families to quantize: ["attn", "mlp"] (full W8A8, max
    # weight-memory saving) or ["mlp"] (wide GEMMs only — measured faster
    # serving, 0.96x vs full int8's 0.92x of bf16; see PERF.md)
    _C.MODEL.QUANT_INT8_FAMILIES = ["attn", "mlp"]
    # static calibrated per-tensor activation scales (vs dynamic per-token):
    # removes the in-graph |x| reductions that ate the int8 serving win
    # (PERF.md int8 A/B).  Calibrates over QUANT_INT8_CALIB_BATCHES test
    # batches at first eval.
    _C.MODEL.QUANT_INT8_STATIC = False
    _C.MODEL.QUANT_INT8_CALIB_BATCHES = 4
    _C.MODEL.HEAD = CN()
    _C.MODEL.HEAD.NAME = ""
    _C.MODEL.HEAD.HIDDEN_LAYERS = ()
    _C.MODEL.HEAD.ACTIVATION = "relu"
    _C.MODEL.HEAD.BN = True
    _C.MODEL.HEAD.DROPOUT = 0.0

    # ------------------------------------------------------------------ optim
    _C.OPTIM = CN()
    _C.OPTIM.NAME = "adam"
    _C.OPTIM.LR = 0.0003
    _C.OPTIM.WEIGHT_DECAY = 5e-4
    _C.OPTIM.MOMENTUM = 0.9
    _C.OPTIM.SGD_DAMPNING = 0
    _C.OPTIM.SGD_NESTEROV = False
    _C.OPTIM.RMSPROP_ALPHA = 0.99
    _C.OPTIM.ADAM_BETA1 = 0.9
    _C.OPTIM.ADAM_BETA2 = 0.999
    _C.OPTIM.STAGED_LR = False
    _C.OPTIM.NEW_LAYERS = ()
    _C.OPTIM.BASE_LR_MULT = 0.1
    _C.OPTIM.LR_SCHEDULER = "single_step"
    _C.OPTIM.STEPSIZE = (-1,)
    _C.OPTIM.GAMMA = 0.1
    _C.OPTIM.MAX_EPOCH = 10
    _C.OPTIM.WARMUP_EPOCH = -1
    _C.OPTIM.WARMUP_TYPE = "linear"
    _C.OPTIM.WARMUP_CONS_LR = 1e-5
    _C.OPTIM.WARMUP_MIN_LR = 1e-5
    _C.OPTIM.WARMUP_RECOUNT = True

    # ------------------------------------------------------------------ train
    _C.TRAIN = CN()
    _C.TRAIN.CHECKPOINT_FREQ = 0
    _C.TRAIN.PRINT_FREQ = 10
    _C.TRAIN.COUNT_ITER = "train_x"
    # TPU extension: rematerialize transformer blocks in the backward pass
    # (jax.checkpoint) — trades ~30% extra FLOPs for flat activation HBM,
    # enabling much larger per-chip batches
    _C.TRAIN.REMAT = False
    # TPU extension: with a device-resident train set (single host), run the
    # WHOLE epoch as one lax.scan dispatch — the per-step host work drops to
    # zero (no per-step H2D, no dispatch round-trips through a remote-TPU
    # relay).  auto|on|off; per-batch log lines are reconstructed from the
    # stacked on-device metrics afterwards.
    _C.TRAIN.EPOCH_FUSE = "auto"
    # TPU extension: with the fused epoch, build the index schedule ON
    # DEVICE (permute a resident index buffer with the epoch PRNG key and
    # gather labels/domains from resident metadata) — per-epoch H2D drops to
    # one key.  Documented divergence when on: the shuffle order comes from
    # the jax PRNG (reproducible from SEED+epoch), not python random, so
    # fused and per-step paths see different (equally uniform) batch orders.
    # False (default) keeps the host-built schedule, byte-identical to the
    # per-step pipeline.
    _C.TRAIN.DEVICE_SCHEDULE = False

    # ------------------------------------------------------------------- test
    _C.TEST = CN()
    _C.TEST.EVALUATOR = "Classification"
    _C.TEST.PER_CLASS_RESULT = False
    _C.TEST.COMPUTE_CMAT = False
    _C.TEST.NO_TEST = False
    _C.TEST.SPLIT = "test"
    _C.TEST.FINAL_MODEL = "last_step"

    # ---------------------------------------------------------------- trainer
    _C.TRAINER = CN()
    _C.TRAINER.NAME = ""

    _C.TRAINER.COOP = CN()
    _C.TRAINER.COOP.N_CTX = 16
    _C.TRAINER.COOP.CSC = False  # class-specific context
    _C.TRAINER.COOP.CTX_INIT = ""
    _C.TRAINER.COOP.PREC = "fp16"  # fp16, fp32, amp, bf16 (TPU default: bf16)
    _C.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"  # middle / end / front
    _C.TRAINER.COOP.USE_FOCAL_LOSS = False
    _C.TRAINER.COOP.LOSS_TYPE = "ce"  # ce, focal, simclr

    _C.TRAINER.COCOOP = CN()
    _C.TRAINER.COCOOP.N_CTX = 16
    _C.TRAINER.COCOOP.CTX_INIT = ""
    _C.TRAINER.COCOOP.PREC = "fp16"
    _C.TRAINER.COCOOP.USE_FOCAL_LOSS = False
    # class-chunked text pass: 0 = auto (chunk only past BATCHED_TEXT_LIMIT),
    # >0 forces that block size.  ImageNet-base (500 cls) runs chunked.
    _C.TRAINER.COCOOP.CLASS_CHUNK = 0

    _C.TRAINER.MAPLE = CN()
    _C.TRAINER.MAPLE.N_CTX = 2
    _C.TRAINER.MAPLE.CTX_INIT = "a photo of a"
    _C.TRAINER.MAPLE.PREC = "fp16"
    _C.TRAINER.MAPLE.PROMPT_DEPTH = 9
    _C.TRAINER.MAPLE.USE_FOCAL_LOSS = False

    _C.TRAINER.PROMPTSRC = CN()
    _C.TRAINER.PROMPTSRC.N_CTX_VISION = 4
    _C.TRAINER.PROMPTSRC.N_CTX_TEXT = 4
    _C.TRAINER.PROMPTSRC.CTX_INIT = "a photo of a"
    _C.TRAINER.PROMPTSRC.PREC = "fp16"
    _C.TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION = 9
    _C.TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT = 9
    _C.TRAINER.PROMPTSRC.TEXT_LOSS_WEIGHT = 25.0
    _C.TRAINER.PROMPTSRC.IMAGE_LOSS_WEIGHT = 10.0
    _C.TRAINER.PROMPTSRC.GPA_MEAN = 15
    _C.TRAINER.PROMPTSRC.GPA_STD = 1
    _C.TRAINER.PROMPTSRC.LABEL_SCOPE = "default"  # "all" or "default"
    _C.TRAINER.PROMPTSRC.LOSS_TYPE = "ce"
    _C.TRAINER.PROMPTSRC.SIMCLR_ALPHA = 0.0
    # keys the reference reads but never defines (SURVEY.md §5.6); defaults
    # chosen to match upstream PromptSRC behavior
    _C.TRAINER.PROMPTSRC.USE_GPA = True
    _C.TRAINER.PROMPTSRC.LOGITS_LOSS_WEIGHT = 1.0
    # TPU extension ("fast SCL"): precompute the frozen teacher's image
    # features once over the deterministic (un-augmented) train images and
    # look them up per step instead of running the teacher tower on every
    # augmented batch — removes ~25% of the step FLOPs.  Semantics
    # deliberately differ from the reference (teacher sees the clean image);
    # off by default.
    _C.TRAINER.PROMPTSRC.CACHED_TEACHER = False
    # TPU extension: run the per-step frozen teacher image tower in int8
    # (W8A8 on the MXU, ops/quant.py) — keeps the reference's
    # teacher-sees-the-augmented-batch semantics (unlike CACHED_TEACHER)
    # at reduced teacher precision.  Safe: the teacher is stop-gradient.
    _C.TRAINER.PROMPTSRC.INT8_TEACHER = False

    _C.TRAINER.IVLP = CN()
    _C.TRAINER.IVLP.N_CTX_VISION = 2
    _C.TRAINER.IVLP.N_CTX_TEXT = 2
    _C.TRAINER.IVLP.CTX_INIT = "a photo of a"
    _C.TRAINER.IVLP.PREC = "fp16"
    _C.TRAINER.IVLP.PROMPT_DEPTH_VISION = 9
    _C.TRAINER.IVLP.PROMPT_DEPTH_TEXT = 9
    _C.TRAINER.IVLP.USE_FOCAL_LOSS = False
    _C.TRAINER.IVLP.SIMCLR_ALPHA = 0.0
    _C.TRAINER.IVLP.USE_MIXUP = True
    _C.TRAINER.IVLP.MIXUP_ALPHA = 1.0
    _C.TRAINER.IVLP.USE_KD = True
    _C.TRAINER.IVLP.KD_TEACHER_MODEL = "resnet50"
    _C.TRAINER.IVLP.KD_ALPHA = 1.0
    _C.TRAINER.IVLP.KD_T = 4.0
    # TPU extension: int8 KD teacher tower (see PROMPTSRC.INT8_TEACHER)
    _C.TRAINER.IVLP.INT8_TEACHER = False

    _C.TRAINER.LINEAR_PROBE = CN()
    _C.TRAINER.LINEAR_PROBE.LOSS_TYPE = "ce"
    _C.TRAINER.LINEAR_PROBE.USE_BIAS = True

    _C.TRAINER.PLIP = CN()
    _C.TRAINER.PLIP.N_CTX_VISION = 0
    _C.TRAINER.PLIP.N_CTX_TEXT = 4
    _C.TRAINER.PLIP.CTX_INIT = "a photo of a"
    _C.TRAINER.PLIP.PREC = "fp16"
    _C.TRAINER.PLIP.PROMPT_DEPTH_VISION = 0
    _C.TRAINER.PLIP.PROMPT_DEPTH_TEXT = 0
    _C.TRAINER.PLIP.REG_COEFF = 0.01
    _C.TRAINER.PLIP.K = 1
    _C.TRAINER.PLIP.REG_TYPE = "grad"  # grad / svd / spectral_norm

    _C.TRAINER.LORA = CN()
    _C.TRAINER.LORA.N_CTX_VISION = 2
    _C.TRAINER.LORA.N_CTX_TEXT = 2
    _C.TRAINER.LORA.CTX_INIT = "a photo of a"
    _C.TRAINER.LORA.PREC = "fp16"
    _C.TRAINER.LORA.PROMPT_DEPTH_VISION = 9
    _C.TRAINER.LORA.PROMPT_DEPTH_TEXT = 9
    _C.TRAINER.LORA.ENCODER = "both"  # text / vision / both
    _C.TRAINER.LORA.POSITION = "all"  # bottom/mid/up/half-up/half-bottom/all/top3
    _C.TRAINER.LORA.PARAMS = ["q", "k", "v"]
    _C.TRAINER.LORA.R = 2
    _C.TRAINER.LORA.ALPHA = 1
    _C.TRAINER.LORA.DROPOUT_RATE = 0.25
    # keys read by the reference trainer but never defined (SURVEY.md §5.6)
    _C.TRAINER.LORA.TEXT_LOSS_WEIGHT = 25.0
    _C.TRAINER.LORA.IMAGE_LOSS_WEIGHT = 10.0
    _C.TRAINER.LORA.LOGITS_LOSS_WEIGHT = 1.0

    # ------------------------------------------- DA/DG/SSL zoo trainers
    # (Dassl defaults.py:221-310 — same keys, same defaults)
    _C.TRAINER.MCD = CN()
    _C.TRAINER.MCD.N_STEP_F = 4
    _C.TRAINER.MME = CN()
    _C.TRAINER.MME.LMDA = 0.1
    _C.TRAINER.CDAC = CN()
    _C.TRAINER.CDAC.CLASS_LR_MULTI = 10
    _C.TRAINER.CDAC.RAMPUP_COEF = 30
    _C.TRAINER.CDAC.RAMPUP_ITRS = 1000
    _C.TRAINER.CDAC.TOPK_MATCH = 5
    _C.TRAINER.CDAC.P_THRESH = 0.95
    _C.TRAINER.CDAC.STRONG_TRANSFORMS = ()
    _C.TRAINER.SE = CN()
    _C.TRAINER.SE.EMA_ALPHA = 0.999
    _C.TRAINER.SE.CONF_THRE = 0.95
    _C.TRAINER.SE.RAMPUP = 300
    _C.TRAINER.M3SDA = CN()
    _C.TRAINER.M3SDA.LMDA = 0.5
    _C.TRAINER.M3SDA.N_STEP_F = 4
    _C.TRAINER.DAEL = CN()
    _C.TRAINER.DAEL.WEIGHT_U = 0.5
    _C.TRAINER.DAEL.CONF_THRE = 0.95
    _C.TRAINER.DAEL.STRONG_TRANSFORMS = ()
    _C.TRAINER.CROSSGRAD = CN()
    _C.TRAINER.CROSSGRAD.EPS_F = 1.0
    _C.TRAINER.CROSSGRAD.EPS_D = 1.0
    _C.TRAINER.CROSSGRAD.ALPHA_F = 0.5
    _C.TRAINER.CROSSGRAD.ALPHA_D = 0.5
    _C.TRAINER.DDAIG = CN()
    _C.TRAINER.DDAIG.G_ARCH = ""
    _C.TRAINER.DDAIG.LMDA = 0.3
    _C.TRAINER.DDAIG.CLAMP = False
    _C.TRAINER.DDAIG.CLAMP_MIN = -1.0
    _C.TRAINER.DDAIG.CLAMP_MAX = 1.0
    _C.TRAINER.DDAIG.WARMUP = 0
    _C.TRAINER.DDAIG.ALPHA = 0.5
    _C.TRAINER.DAELDG = CN()
    _C.TRAINER.DAELDG.WEIGHT_U = 0.5
    _C.TRAINER.DAELDG.CONF_THRE = 0.95
    _C.TRAINER.DAELDG.STRONG_TRANSFORMS = ()
    _C.TRAINER.DOMAINMIX = CN()
    _C.TRAINER.DOMAINMIX.TYPE = "crossdomain"
    _C.TRAINER.DOMAINMIX.ALPHA = 1.0
    _C.TRAINER.DOMAINMIX.BETA = 1.0
    _C.TRAINER.ENTMIN = CN()
    _C.TRAINER.ENTMIN.LMDA = 1e-3
    _C.TRAINER.MEANTEACHER = CN()
    _C.TRAINER.MEANTEACHER.WEIGHT_U = 1.0
    _C.TRAINER.MEANTEACHER.EMA_ALPHA = 0.999
    _C.TRAINER.MEANTEACHER.RAMPUP = 5
    _C.TRAINER.MIXMATCH = CN()
    _C.TRAINER.MIXMATCH.WEIGHT_U = 100.0
    _C.TRAINER.MIXMATCH.TEMP = 2.0
    _C.TRAINER.MIXMATCH.MIXUP_BETA = 0.75
    _C.TRAINER.MIXMATCH.RAMPUP = 20000
    _C.TRAINER.FIXMATCH = CN()
    _C.TRAINER.FIXMATCH.WEIGHT_U = 1.0
    _C.TRAINER.FIXMATCH.CONF_THRE = 0.95
    _C.TRAINER.FIXMATCH.STRONG_TRANSFORMS = ()

    return _C
