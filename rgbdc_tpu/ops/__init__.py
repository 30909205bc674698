from .math import ste_round, lower_bound, quantize_ste
from .ckbd import (
    ckbd_anchor,
    ckbd_nonanchor,
    ckbd_split,
    ckbd_merge,
    ckbd_anchor_squeeze,
    ckbd_nonanchor_squeeze,
    ckbd_anchor_unsqueeze,
    ckbd_nonanchor_unsqueeze,
    anchor_mask,
)
from .gdn import GDN

__all__ = [
    "ste_round",
    "lower_bound",
    "quantize_ste",
    "ckbd_anchor",
    "ckbd_nonanchor",
    "ckbd_split",
    "ckbd_merge",
    "ckbd_anchor_squeeze",
    "ckbd_nonanchor_squeeze",
    "ckbd_anchor_unsqueeze",
    "ckbd_nonanchor_unsqueeze",
    "anchor_mask",
    "GDN",
]
