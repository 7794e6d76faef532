"""Per-generation device-resident index planes (the HBM snapshot).

The measured v5e truth (ops/arena_scorer.py docstring): random gather and
scatter run at ~270 ns/element over HBM, while dense row reads stream at
memory bandwidth. So the device index is NOT posting id lists — it is
dense per-document planes, one ROW per cached posting structure:

  * bitmap rows (D/32 int32 words) for membership masks — per-(term,class)
    docids, per-term exact words, per-query filter universes;
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
bytes: all fill-default is per-structure, so byte row 0 is all 255 = the
INF sentinel used by fid/pos) so absent structures need no branches.

Every device execute over the axon tunnel costs ~28 ms, so pools are
appended INSIDE the batch kernel (donated input -> updated output), never
by a separate device op. Capacities follow a pow4 row ladder to keep
compiled shapes stable.
"""

from __future__ import annotations

import numpy as np

MIN_ROWS = 64
MAX_BYTES = 6 << 30  # cap combined pool footprint; beyond -> host fallback


def _row_capacity(n: int) -> int:
    cap = MIN_ROWS
    while cap < n:
        cap *= 4
    return cap


def fresh_rows_bucket(n: int) -> int:
    b = 4
    while b < n:
        b *= 4
    return b


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
    """Row pools for one store at one plane width D."""

    def __init__(self, store, D: int):
        self.store = store
        self.D = D
        self.generation = store.generation
        self.bit_pool = None  # jnp (NB, D/32) int32
        self.byte_pool = None  # jnp (NC, D) int8
        self.bit_used = 1  # row 0 reserved (all-zero)
        self.byte_used = 1  # row 0 reserved (all-255 INF)
        self._bit_rows: dict = {}  # cache key -> row index
        self._byte_rows: dict = {}
        self._staged_bits: list[np.ndarray] = []
        self._staged_bytes: list[np.ndarray] = []

    def _reset_if_stale(self) -> None:
        if self.generation != self.store.generation:
            self.generation = self.store.generation
            self.bit_pool = None
            self.byte_pool = None
            self.bit_used = 1
            self.byte_used = 1
            self._bit_rows.clear()
            self._byte_rows.clear()
            self._staged_bits = []
            self._staged_bytes = []

    def footprint(self) -> int:
        nb = self.bit_used + len(self._staged_bits)
        nc = self.byte_used + len(self._staged_bytes)
        return nb * (self.D // 32) * 4 + nc * self.D

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

    def prepare_batch(self, transient_ids=None):
        """Kernel inputs + transient row indices.

        `transient_ids`: per-query docid arrays (filter universes). They
        are staged AFTER every remembered row, so the watermark advance in
        absorb() never covers them and the next batch overwrites them.
        Returns (bit_pool, byte_pool, fresh_bits, fresh_bytes, bit_used,
        byte_used, transient_rows)."""
        import jax
        import jax.numpy as jnp

        self._reset_if_stale()
        D32 = self.D // 32
        transient_rows = []
        n_trans = 0
        for ids in transient_ids or []:
            transient_rows.append(self.bit_used + len(self._staged_bits))
            self._staged_bits.append(pack_bitmap(ids, self.D))
            n_trans += 1

        def stack(staged, width, dtype, pad_row):
            rows = fresh_rows_bucket(max(len(staged), 1))
            out = np.empty((rows, width), dtype=dtype)
            for i, r in enumerate(staged):
                out[i] = r
            for i in range(len(staged), rows):
                out[i] = pad_row
            return out

        fresh_bits = stack(
            self._staged_bits, D32, np.int32, np.zeros(D32, np.int32)
        )
        fresh_bytes = stack(
            self._staged_bytes, self.D, np.int8, np.full(self.D, -1, np.int8)
        )

        nb_cap = _row_capacity(self.bit_used + fresh_bits.shape[0])
        nc_cap = _row_capacity(self.byte_used + fresh_bytes.shape[0])
        # capacity only grows within a generation (a shrink would truncate
        # resident rows; generation changes reset the pools instead)
        if self.bit_pool is not None:
            nb_cap = max(nb_cap, self.bit_pool.shape[0])
        if self.byte_pool is not None:
            nc_cap = max(nc_cap, self.byte_pool.shape[0])
        # capacity growth copies the WHOLE old pool (static shapes: one
        # compiled variant per ladder step, not one per watermark value)
        if self.bit_pool is None or self.bit_pool.shape[0] != nb_cap:
            old = self.bit_pool
            pool = jnp.zeros((nb_cap, D32), jnp.int32)
            if old is not None:
                pool = pool.at[: old.shape[0]].set(old)
            self.bit_pool = pool
        if self.byte_pool is None or self.byte_pool.shape[0] != nc_cap:
            old = self.byte_pool
            pool = jnp.full((nc_cap, self.D), -1, jnp.int8)
            if old is not None:
                pool = pool.at[: old.shape[0]].set(old)
            self.byte_pool = pool

        self._commit_bits = len(self._staged_bits) - n_trans
        self._commit_bytes = len(self._staged_bytes)
        return (
            self.bit_pool,
            self.byte_pool,
            fresh_bits,
            fresh_bytes,
            self.bit_used,
            self.byte_used,
            transient_rows,
        )

    def absorb(self, bit_pool, byte_pool) -> None:
        """Adopt the kernel's updated pools and advance the watermarks
        past the remembered rows (transients stay above and get
        overwritten by the next batch)."""
        self.bit_pool = bit_pool
        self.byte_pool = byte_pool
        self.bit_used += self._commit_bits
        self.byte_used += self._commit_bytes
        self._staged_bits = []
        self._staged_bytes = []


def get_arena(store, D: int) -> DeviceArena:
    arena = getattr(store, "_device_arena", None)
    if arena is None or arena.D != D:
        arena = DeviceArena(store, D)
        store._device_arena = arena
    return arena
