"""Per-generation device-resident index planes (the HBM snapshot).

The measured v5e truth (ops/arena_scorer.py docstring): random gather and
scatter run at ~270 ns/element over HBM, while dense row reads stream at
memory bandwidth. So the device index is NOT posting id lists — it is
dense per-document planes, one ROW per cached posting structure:

  * bitmap rows (D/32 int32 words) for membership masks — per-(term,class)
    docids, per-term exact words;
  * byte rows (D int8) for cost structures — min pair-proximity per
    (left-class, right-class), min fid weight, min position cost,
    ExactAttribute rank per words level — host-merged so one row carries
    the whole structure with its default as the fill value.

A query descriptor is then a handful of ROW INDICES in fixed-shape
matrices; the kernel is pure dense row gathers + the chain DP. Rows are
built on host once per (generation, structure), uploaded once, resident
until the store generation changes (the atomic-snapshot-swap model of
SURVEY §7; the reference's LMDB-page-cache role).

Row 0 of each pool is reserved as the identity row (bitmap: all zero;
byte: all 255 = the per-structure default sentinel) so absent structures
need no branches.

Compile-variant discipline (the round-2 BENCH lesson — each variant costs
30-290 s of XLA over the tunnel): pool capacities are FIXED per plane
width D, appends go through one trivial fixed-chunk kernel
(arena_scorer.append_rows), and filter universes never enter the pools.
If a pool ever fills, the arena resets and rows re-register on demand
from the host caches — a cache flush, not a failure.
"""

from __future__ import annotations

import numpy as np

# fixed fresh-row chunk: one compiled append kernel per pool shape. Lives
# here (not in ops.arena_scorer) so importing the arena never touches jax —
# the serving import chain must stay loadable when no backend exists.
APPEND_ROWS = 64

BIT_POOL_BYTES = 1 << 30  # 1 GiB of bitmap rows
BYTE_POOL_BYTES = 2 << 30  # 2 GiB of cost rows
MAX_BIT_ROWS = 16384
MAX_BYTE_ROWS = 4096


def bit_capacity(D: int) -> int:
    return int(min(MAX_BIT_ROWS, max(256, BIT_POOL_BYTES // (D // 8))))


def byte_capacity(D: int) -> int:
    return int(min(MAX_BYTE_ROWS, max(128, BYTE_POOL_BYTES // D)))


def pack_bitmap(ids: np.ndarray, D: int) -> np.ndarray:
    """Sorted docids -> (D/32,) int32 little-bit-order bitmap row."""
    mask = np.zeros(D, dtype=bool)
    if len(ids):
        mask[ids] = True
    return np.packbits(mask, bitorder="little").view(np.uint32).astype(np.int32)


def byte_plane(parts, D: int, fill: int) -> np.ndarray:
    """[(ids, value)] -> (D,) int8 row with `fill` as the default.

    Parts are assigned in descending value order so overlapping ids keep
    the MINIMUM value (the merge the round-1 kernel did with scatter-min —
    but once, on host, instead of per query on device)."""
    plane = np.full(D, fill, dtype=np.int8)
    for ids, value in sorted(parts, key=lambda p: -p[1]):
        if len(ids):
            plane[ids] = np.int8(value)
    return plane


class DeviceArena:
    """Row pools for one store at one plane width D. Fixed capacity; a
    full pool resets (rows re-register lazily from host caches)."""

    def __init__(self, store, D: int):
        self.store = store
        self.D = D
        self.generation = store.generation
        self.bit_cap = bit_capacity(D)
        self.byte_cap = byte_capacity(D)
        self.bit_pool = None  # jnp (bit_cap, D/32) int32
        self.byte_pool = None  # jnp (byte_cap, D) int8
        self.bit_used = 1  # row 0 reserved (all-zero)
        self.byte_used = 1  # row 0 reserved (all-255 sentinel)
        self._bit_rows: dict = {}  # cache key -> row index
        self._byte_rows: dict = {}
        self._staged_bits: list[np.ndarray] = []
        self._staged_bytes: list[np.ndarray] = []

    def _reset_rows(self) -> None:
        self.bit_used = 1
        self.byte_used = 1
        self._bit_rows.clear()
        self._byte_rows.clear()
        self._staged_bits = []
        self._staged_bytes = []

    def _reset_if_stale(self) -> None:
        if self.generation != self.store.generation:
            self.generation = self.store.generation
            self._reset_rows()

    def has_room(self, bit_rows_needed: int, byte_rows_needed: int) -> bool:
        """Whether `*_needed` more rows fit without overflowing a pool
        (APPEND_ROWS headroom covers append-chunk padding)."""
        self._reset_if_stale()
        return (
            self.bit_used + len(self._staged_bits) + bit_rows_needed
            <= self.bit_cap - APPEND_ROWS
            and self.byte_used + len(self._staged_bytes) + byte_rows_needed
            <= self.byte_cap - APPEND_ROWS
        )

    def reset_rows(self) -> None:
        """Drop every registered row (a cache flush: rows re-register from
        the host caches on demand). Callers must not hold row indices
        across this — execute pending batches first."""
        self._reset_rows()

    def footprint(self) -> int:
        return self.bit_cap * (self.D // 32) * 4 + self.byte_cap * self.D

    # -- row registration ---------------------------------------------------

    def bit_row(self, key, build) -> int:
        """Row index for a bitmap structure; build() -> sorted docid array."""
        self._reset_if_stale()
        row = self._bit_rows.get(key)
        if row is None:
            row = self.bit_used + len(self._staged_bits)
            self._staged_bits.append(pack_bitmap(build(), self.D))
            self._bit_rows[key] = row
        return row

    def byte_row(self, key, build, fill: int) -> int:
        """Row index for a cost structure; build() -> [(ids, value)]."""
        self._reset_if_stale()
        row = self._byte_rows.get(key)
        if row is None:
            parts = build()
            row = self.byte_used + len(self._staged_bytes)
            self._staged_bytes.append(byte_plane(parts, self.D, fill))
            self._byte_rows[key] = row
        return row

    # -- batch I/O ---------------------------------------------------------------

    def _append(self, pool, staged, used, pad_value, dtype, width):
        """Upload staged rows in fixed APPEND_ROWS chunks (one compiled
        append kernel per pool shape — never a scorer recompile)."""
        from ..ops.arena_scorer import append_rows

        for start in range(0, len(staged), APPEND_ROWS):
            chunk = staged[start : start + APPEND_ROWS]
            buf = np.full((APPEND_ROWS, width), pad_value, dtype=dtype)
            for i, row in enumerate(chunk):
                buf[i] = row
            # padding rows land above the watermark and are overwritten by
            # the next append; capacity headroom is guaranteed by ensure_room
            pool = append_rows(pool, buf, np.int32(used + start))
        return pool, used + len(staged)

    def prepare_batch(self):
        """Flush staged rows into the resident pools; returns
        (bit_pool, byte_pool) ready for the scorer."""
        import jax.numpy as jnp

        self._reset_if_stale()
        D32 = self.D // 32
        if self.bit_pool is None or self.bit_pool.shape[0] != self.bit_cap:
            self.bit_pool = jnp.zeros((self.bit_cap, D32), jnp.int32)
            self.bit_used = 1
        if self.byte_pool is None or self.byte_pool.shape[0] != self.byte_cap:
            self.byte_pool = jnp.full((self.byte_cap, self.D), -1, jnp.int8)
            self.byte_used = 1
        if self._staged_bits:
            self.bit_pool, self.bit_used = self._append(
                self.bit_pool, self._staged_bits, self.bit_used, 0,
                np.int32, D32,
            )
            self._staged_bits = []
        if self._staged_bytes:
            self.byte_pool, self.byte_used = self._append(
                self.byte_pool, self._staged_bytes, self.byte_used, -1,
                np.int8, self.D,
            )
            self._staged_bytes = []
        return self.bit_pool, self.byte_pool


def get_arena(store, D: int) -> DeviceArena:
    arena = getattr(store, "_device_arena", None)
    if arena is None or arena.D != D:
        arena = DeviceArena(store, D)
        store._device_arena = arena
    return arena
