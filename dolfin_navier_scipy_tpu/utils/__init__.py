"""I/O, caching, timers, logging, visualization output, spectra."""

from . import io  # noqa: F401
from . import vtk  # noqa: F401
from .io import (  # noqa: F401
    Timer,
    get_datastr,
    load_npa,
    load_or_comp,
    load_spa,
    logtofile,
    meas_output_diff,
    plot_outp_sig,
    save_npa,
    save_output_json,
    save_spa,
)
