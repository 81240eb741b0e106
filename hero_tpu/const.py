"""Framework-wide constants.

Mirrors the reference constants (``utils/const.py:6-8`` in HERO): the
4352-dim concatenated SlowFast+ResNet-152 frame feature, the 100-frame clip
cap, and the VCMR IoU thresholds used by all retrieval metrics.
"""

VFEAT_DIM = 4352
MAX_FRM_SEQ_LEN = 100
VCMR_IOU_THDS = (0.5, 0.7)

# RoBERTa BPE conventions (reference: model/embed.py:15, data meta.json).
TXT_PAD_IDX = 1

# Additive mask value for "impossible" logits (reference
# model/modeling_utils.py:42-43 uses -1e4; BertEncoder uses -10000.0).
MASK_LOGIT_EPS = -1e4

# Sub packing (hero_tpu/data/packing.py): max packed subs ("segments")
# per f-encoder row — the static width of the segment one-hot the
# attention kernel contracts to build its block-diagonal mask.
PACK_MAX_SEGS = 16
