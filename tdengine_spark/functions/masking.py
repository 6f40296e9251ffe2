"""Data-masking / security scalar functions (reference builtins.c
mask_full/partial/none 7793-7849, aes_encrypt/decrypt 7870-7905).

Pure expressions; AES delegates to Spark's built-in aes_encrypt/
aes_decrypt (same GCM default as the reference's OpenSSL path).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves "pd.Series" hints here

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: "Column | str") -> Column:
    return F.col(col) if isinstance(col, str) else col


def mask_full(col: "Column | str", mask_char: str = "*") -> Column:
    """Replace every character (builtins.c:7793)."""
    c = _c(col)
    return F.when(c.isNotNull(), F.repeat(F.lit(mask_char), F.length(c)))


def mask_partial(
    col: "Column | str", keep_prefix: int = 1, keep_suffix: int = 1,
    mask_char: str = "*",
) -> Column:
    """Keep first/last n characters, mask the middle (builtins.c:7821).
    Strings shorter than prefix+suffix pass through unchanged."""
    c = _c(col)
    n = F.length(c)
    middle = n - keep_prefix - keep_suffix
    masked = F.concat(
        F.substring(c, 1, keep_prefix),
        F.repeat(F.lit(mask_char), middle),
        F.substring(c, -keep_suffix, keep_suffix),
    )
    return F.when(middle > 0, masked).otherwise(c)


def mask_none(col: "Column | str") -> Column:
    """Identity (role-based masking's pass-through leg, builtins.c:7849)."""
    return _c(col)


def aes_encrypt(col: "Column | str", key: str, mode: str = "GCM") -> Column:
    """aes_encrypt (builtins.c:7870) → Spark built-in."""
    return F.aes_encrypt(_c(col).cast("binary"), F.lit(key), F.lit(mode))


def aes_decrypt(col: "Column | str", key: str, mode: str = "GCM") -> Column:
    return F.aes_decrypt(_c(col), F.lit(key), F.lit(mode))


def totp(
    key: "Column | str",
    ts: "Column | str",
    digits: int = 6,
    period: int = 30,
) -> Column:
    """RFC 6238 TOTP code for the instant in ``ts`` (reference totp,
    builtins.c:7658). ``key`` is the shared secret as a base32 string
    (the standard authenticator encoding; falls back to raw ASCII bytes
    when base32 decode fails). Deterministic given (key, ts) — unlike a
    wall-clock TOTP, so results are testable and re-runnable."""
    from pyspark.sql.functions import pandas_udf

    kc = _c(key).cast("string")
    tc = F.unix_seconds(_c(ts).cast("timestamp"))

    @pandas_udf("string")
    def _totp(keys: pd.Series, secs: pd.Series) -> pd.Series:
        import base64
        import hashlib
        import hmac
        import struct as _struct

        def code(k, t):
            if k is None or t is None:
                return None
            try:
                secret = base64.b32decode(k.upper() + "=" * (-len(k) % 8))
            except Exception:
                secret = k.encode()
            counter = int(t) // period
            mac = hmac.new(
                secret, _struct.pack(">Q", counter), hashlib.sha1
            ).digest()
            off = mac[-1] & 0x0F
            binc = (
                ((mac[off] & 0x7F) << 24)
                | (mac[off + 1] << 16)
                | (mac[off + 2] << 8)
                | mac[off + 3]
            )
            return str(binc % (10**digits)).zfill(digits)

        return pd.Series(
            [code(k, t) for k, t in zip(keys, secs)], dtype=object
        )

    return _totp(kc, tc)
