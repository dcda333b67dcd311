from .ops import (
    qr_pos,
    lq_pos,
    leftorth,
    rightorth,
    leftnull,
    rightnull,
    svd_truncated,
    TruncationScheme,
    truncdim,
    truncerr,
    truncbelow,
    notrunc,
)
