from nbody.distributed.sharding import (
    device_mesh,
    shard_state,
    make_ring_acc_fn,
    make_sharded_pm_cosmo_force,
)

__all__ = [
    "device_mesh",
    "shard_state",
    "make_ring_acc_fn",
    "make_sharded_pm_cosmo_force",
]
