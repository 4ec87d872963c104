from .native import host_lib, design_filterbank_native  # noqa: F401
from .phase_grid import PhaseState, phase_grid, required_samples, expected_output  # noqa: F401
