from .params import (
    ALL_FIELDS,
    BN254_FQ,
    BN254_FR,
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    SECP256R1_FP,
    SECP256R1_FQ,
    FieldParams,
    int_to_limbs,
    limbs_to_int,
)
from . import mont
