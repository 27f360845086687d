from nbody.ic import systems
from nbody.ic.gaussian import gaussian_field, GRFSpec
from nbody.ic.zeldovich import lpt_ic

__all__ = ["systems", "gaussian_field", "GRFSpec", "lpt_ic"]
