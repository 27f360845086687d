from nbody.forces.allpairs import (
    direct_acc,
    direct_acc_chunked,
    direct_acc_periodic,
    direct_potential,
)
from nbody.forces.pallas_pp import allpairs_pallas, block_acc_pallas
from nbody.forces.pm import pm_acc, make_pm_cosmo_force
from nbody.forces.p3m import p3m_acc

__all__ = [
    "direct_acc",
    "direct_potential",
    "direct_acc_chunked",
    "direct_acc_periodic",
    "allpairs_pallas",
    "block_acc_pallas",
    "pm_acc",
    "make_pm_cosmo_force",
    "p3m_acc",
]
