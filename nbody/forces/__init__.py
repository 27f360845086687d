from nbody.forces.allpairs import direct_acc, direct_potential, direct_acc_chunked
from nbody.forces.pallas_pp import allpairs_pallas

__all__ = [
    "direct_acc",
    "direct_potential",
    "direct_acc_chunked",
    "allpairs_pallas",
]
