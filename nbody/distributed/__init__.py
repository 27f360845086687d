from nbody.distributed.sharding import (
    device_mesh,
    shard_state,
    make_ring_acc_fn,
    make_sharded_pm_cosmo_force,
)
from nbody.distributed.domain import (
    domain_decompose,
    domain_gather,
    make_domain_p3m_force,
    run_cosmological_domain,
)

__all__ = [
    "device_mesh",
    "shard_state",
    "make_ring_acc_fn",
    "make_sharded_pm_cosmo_force",
    "domain_decompose",
    "domain_gather",
    "make_domain_p3m_force",
    "run_cosmological_domain",
]
