"""I/O: CONCEPT-format interop (HDF5 snapshots, powerspec text, sidecars).

Rebuilds components C10 (snapshot I/O), C11 (powerspec-text reader) and the
sidecar contract of C20 from SURVEY.md §2, so outputs of this framework are
drop-in readable by the reference's analysis scripts and vice versa.
"""

from nbody.io.snapshot import (
    SnapshotMeta,
    read_boxsize,
    read_positions,
    read_snapshot,
    write_snapshot,
    find_hdf5_files,
    AsyncSnapshotWriter,
)
from nbody.io.powerspec import PowerSpecTable, read_powerspec, write_powerspec
from nbody.io.sidecars import (
    BoxParams,
    MaxMinParams,
    read_box_params,
    read_maxmin_params,
    read_param_table,
    write_box_params,
    write_maxmin_params,
    write_param_table,
)

__all__ = [
    "SnapshotMeta",
    "read_boxsize",
    "read_positions",
    "read_snapshot",
    "write_snapshot",
    "find_hdf5_files",
    "AsyncSnapshotWriter",
    "PowerSpecTable",
    "read_powerspec",
    "write_powerspec",
    "BoxParams",
    "MaxMinParams",
    "read_box_params",
    "read_maxmin_params",
    "read_param_table",
    "write_box_params",
    "write_maxmin_params",
    "write_param_table",
]
