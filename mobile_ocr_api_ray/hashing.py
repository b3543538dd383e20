"""THE sampling hash every sampler, splitter, mixer and shard exporter
shares (and every SQL oracle reproduces as
``cast(('0x' || substring(md5(cast(k AS VARCHAR)), 1, 8)) AS UBIGINT)``):
the first 8 hex digits of md5(str(key)) as a 32-bit int. One definition —
a change here (salt, width) must be mirrored in the oracles, and nowhere
else."""

from __future__ import annotations

import hashlib


def hash32(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)
