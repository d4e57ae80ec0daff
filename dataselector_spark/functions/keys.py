"""Composite record keys.

The reference builds record identity as a minute-truncated ISO timestamp plus
an optional "salt" column (`formatISODate`, /root/reference/index.js:726-735)
because two flasks share each collection timestamp (index.js:23-24). We
implement the documented intent (key = date + salt); the as-shipped variant
(salt lost to the `toolTipSalt` bug, index.js:462/63 — keys collapse to the
minute) is `minute_key`, kept for replay tests.

Pure string-expression columns: safe as join/group keys at any scale and
codegen'd JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINUTE_FMT = "yyyy-MM-dd HH:mm"


def minute_key(ts: Column | str) -> Column:
    """Minute-truncated `yyyy-MM-dd HH:mm` key (index.js:729-733 null-salt branch)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(F.date_trunc("minute", ts), MINUTE_FMT)


def composite_key(ts: Column | str, salt: Column | str | None = None) -> Column:
    """`'yyyy-MM-dd HH:mm' || ' ' || salt` (index.js:726-735 with salt)."""
    key = minute_key(ts)
    if salt is None:
        return key
    salt = F.col(salt) if isinstance(salt, str) else salt
    return F.concat_ws(" ", key, salt.cast("string"))
