"""Multi-chip execution. Lazy exports: importing this package must not
initialize a jax backend (the rendezvous helper is pure-host code used by
the index store on import paths where no device exists)."""

from .rendezvous import rendezvous_shard

__all__ = ["sharded_query_topk", "sharded_store_topk", "make_mesh", "rendezvous_shard"]


def __getattr__(name):
    if name in ("sharded_query_topk", "sharded_store_topk", "make_mesh",
                "store_chain_inputs"):
        from . import sharded

        return getattr(sharded, name)
    raise AttributeError(name)
