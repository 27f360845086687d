"""Analysis: solver comparisons, accuracy metrics, runtime parsing.

Rebuilds the reference's L5 plot/analysis layer (SURVEY.md §1):
`PPPMP3M/pppmp3mplotter.py` (solver accuracy-vs-cost study),
`1LPTvs2LPT/1vs2tlptplotter.py`, `Different_Sizes/Plotter.py` (resolution
convergence), and the C12 runtime parser.
"""

from nbody.analysis.compare import (
    compare_solver_spectra,
    lpt_comparison,
    mean_relative_error,
    nyquist_k,
    parse_runtime,
    relative_error,
    resolution_study,
)

__all__ = [
    "compare_solver_spectra",
    "lpt_comparison",
    "mean_relative_error",
    "nyquist_k",
    "parse_runtime",
    "relative_error",
    "resolution_study",
]

from nbody.analysis.compare import ensemble_scatter

__all__ += ["ensemble_scatter"]

from nbody.analysis.render import (
    density_projection,
    render_snapshot,
    save_density_image,
)

__all__ += ["density_projection", "render_snapshot", "save_density_image"]
