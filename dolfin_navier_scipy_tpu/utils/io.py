"""Data output, caching and timing utilities.

Twin of the reference's ``data_output_utils.py``: array persistence
(:74-110), compute-or-load memoization (:280-372), JSON output signals
(:113-277), ``Timer`` and ``logtofile`` (:375-412), and the
parameter-encoding cache keys of ``get_datastr_snu``
(stokes_navier_utils.py:21-37).
"""

import json
import logging
import os
import sys
import time

import numpy as np
import scipy.io
import scipy.sparse as sps


def get_datastr(time=None, meshp=None, nu=None, Nts=None, data_prfx="",
                semiexpl=False):
    """Parameter-encoding cache keys, format-compatible with the
    reference's ``get_datastr_snu`` (stokes_navier_utils.py:21-37): all
    fields always appear (``nuNone``/``NtsNone`` when unset), so runs
    with different meshes or step counts never collide on one file."""
    sestr = "_semexp" if semiexpl else ""
    nustr = "_nuNone" if nu is None else "_nu{0:.3e}".format(nu)
    ntsstr = "_NtsNone" if Nts is None else "_Nts{0}".format(Nts)
    timstr = ("timeNone" if time is None or isinstance(time, str)
              else "time{0:.5e}".format(time))
    mshstr = "_mesh{0}".format(meshp)
    return data_prfx + timstr + nustr + mshstr + ntsstr + sestr


# -- array persistence ---------------------------------------------------------

def save_npa(v, fstring="notspecified"):
    np.save(fstring, np.asarray(v))


def load_npa(fstring):
    if fstring.endswith(".npy"):
        return np.load(fstring)
    return np.load(fstring + ".npy")


def save_spa(sparray, fstring="notspecified"):
    scipy.io.mmwrite(fstring, sps.coo_matrix(sparray))


def load_spa(fstring):
    if not os.path.exists(fstring) and os.path.exists(fstring + ".mtx"):
        fstring = fstring + ".mtx"
    return sps.csc_matrix(scipy.io.mmread(fstring))


def load_or_comp(filestr=None, comprtn=None, comprtnargs={},
                 arraytype=None, debug=False, verbose=True,
                 itsadict=False, numthings=1):
    """Compute-or-load memoization keyed by filename
    (data_output_utils.py:280-372)."""
    if filestr is None or debug:
        return comprtn(**comprtnargs)
    if not isinstance(filestr, list):
        filestr = [filestr]

    loaders = {"dense": (load_npa, save_npa), "sparse": (load_spa, save_spa)}

    if itsadict:
        try:
            things = []
            for fs in filestr:
                with open(fs) as f:
                    things.append(json.load(f))
            return things[0] if len(things) == 1 else things
        except IOError:
            thing = comprtn(**comprtnargs)
            with open(filestr[0], "w") as f:
                json.dump(thing, f)
            return thing

    load, save = loaders.get(arraytype or "dense", loaders["dense"])
    try:
        things = [load(fs) for fs in filestr]
        if verbose:
            logging.info(f"loaded {filestr}")
    except (IOError, FileNotFoundError, ValueError):
        res = comprtn(**comprtnargs)
        things = list(res) if numthings > 1 else [res]
        for fs, t in zip(filestr, things):
            save(t, fs)
        if verbose:
            logging.info(f"computed and saved {filestr}")
    return things[0] if len(things) == 1 else things


# -- output signals ------------------------------------------------------------

def save_output_json(datadict=None, fstring="unspecified_outputfile",
                     module="dolfin_navier_scipy_tpu.utils.io",
                     plotroutine="plot_outp_sig"):
    """JSON signal dump with self-describing replay instructions
    (data_output_utils.py:202-221)."""
    jsfile = open(fstring, mode="w")
    jsfile.write(json.dumps(dict(datadict=datadict, module=module,
                                 plotroutine=plotroutine)))
    jsfile.close()
    logging.info(f"output saved to {fstring}; replay with "
                 f"`{module}.{plotroutine}('{fstring}')`")


def extract_output(dictofpaths=None, tmesh=None, c_mat=None, ystarvec=None):
    """``y = C v`` over a stored velocity trajectory
    (data_output_utils.py:224-241)."""
    cur_v = load_npa(dictofpaths[tmesh[0]])
    yn = c_mat @ cur_v.flatten()
    ylist = [yn.tolist()]
    for t in tmesh[1:]:
        cur_v = load_npa(dictofpaths[t])
        yn = c_mat @ cur_v.flatten()
        ylist.append(yn.tolist())
    if ystarvec is None:
        return ylist
    ystarlist = [ystarvec(tmesh[0]).flatten().tolist()]
    for t in tmesh[1:]:
        ystarlist.append(ystarvec(t).flatten().tolist())
    return ylist, ystarlist


def meas_output_diff(ylist, tmesh, ystar):
    """Trapezoidal tracking-error integral (data_output_utils.py:244-277)."""
    err = 0.0
    for k in range(1, len(tmesh)):
        dt = tmesh[k] - tmesh[k - 1]
        e0 = np.linalg.norm(np.asarray(ylist[k - 1])
                            - np.asarray(ystar(tmesh[k - 1])).ravel()) ** 2
        e1 = np.linalg.norm(np.asarray(ylist[k])
                            - np.asarray(ystar(tmesh[k])).ravel()) ** 2
        err += 0.5 * dt * (e0 + e1)
    return err


def save_outp_sig_tikz(tmesh, outsig, tikzfile):
    """Write the signal as a standalone pgfplots ``.tex`` picture — the
    native replacement for the reference's tikzplotlib export
    (data_output_utils.py:134-141), with no external dependency."""
    sig = np.atleast_2d(np.asarray(outsig, dtype=float))
    if sig.shape[0] != len(tmesh):
        sig = sig.T
    lines = ["\\begin{tikzpicture}",
             "\\begin{axis}[xlabel={$t$}]"]
    for j in range(sig.shape[1]):
        coords = " ".join(f"({t:.10g},{y:.10g})"
                          for t, y in zip(tmesh, sig[:, j]))
        lines.append(f"\\addplot coordinates {{{coords}}};")
    lines += ["\\end{axis}", "\\end{tikzpicture}", ""]
    with open(tikzfile, "w") as f:
        f.write("\n".join(lines))
    logging.info(f"tikz picture saved to {tikzfile}")


def plot_outp_sig(str_to_json=None, tmeshkey="tmesh", sigkey="outsig",
                  outsig=None, tmesh=None, fignum=222, tikzfile=None):
    """Plot a stored output signal (data_output_utils.py:113-199);
    matplotlib is imported lazily and optional.  ``tikzfile`` writes a
    pgfplots ``.tex`` export alongside (data_output_utils.py:134-141)."""
    if str_to_json is not None:
        with open(str_to_json) as f:
            jsdict = json.load(f)
        dd = jsdict["datadict"] if "datadict" in jsdict else jsdict
        tmesh = dd[tmeshkey]
        outsig = dd[sigkey]
    if tikzfile is not None:
        save_outp_sig_tikz(tmesh, outsig, tikzfile)
    try:
        import matplotlib.pyplot as plt
    except ImportError:
        logging.warning("matplotlib unavailable; returning data")
        return tmesh, outsig
    plt.figure(fignum)
    plt.plot(tmesh, np.asarray(outsig))
    plt.xlabel("t")
    return tmesh, outsig


# -- timing / logging -----------------------------------------------------------

class Timer:
    """Wall-clock context manager (data_output_utils.py:391-412); also
    hooks ``jax.block_until_ready``-style sync via an optional callable.

    ``trace_dir``: when set, the timed region is additionally captured
    with ``jax.profiler`` (XLA/TPU op-level traces viewable in
    TensorBoard/Perfetto) — the TPU-native upgrade of the reference's
    wall-clock-only Timer (SURVEY.md section 5.1).
    ``annotate``: wrap the region in a named ``TraceAnnotation`` so it is
    findable inside an enclosing profiler capture.
    """

    def __init__(self, name="timer", logger=None, timerinfo={}, sync=None,
                 verbose=True, trace_dir=None, annotate=False):
        self.name = name
        self.logger = logger
        self.timerinfo = timerinfo
        self.sync = sync
        self.verbose = verbose
        self.trace_dir = trace_dir
        self.annotate = annotate
        self._ann = None

    def __enter__(self):
        if self.sync is not None:
            self.sync()
        if self.trace_dir is not None:
            import jax

            jax.profiler.start_trace(self.trace_dir)
        if self.annotate:
            import jax

            self._ann = jax.profiler.TraceAnnotation(self.name)
            self._ann.__enter__()
        self.tstart = time.perf_counter()
        return self

    def __exit__(self, *args):
        if self.sync is not None:
            self.sync()
        if self._ann is not None:
            self._ann.__exit__(None, None, None)
        if self.trace_dir is not None:
            import jax

            jax.profiler.stop_trace()
            logging.info(f"{self.name}: jax trace written to "
                         f"{self.trace_dir}")
        self.elapsed = time.perf_counter() - self.tstart
        self.timerinfo.update({self.name: self.elapsed})
        msg = f"{self.name}: Elapsed time: {self.elapsed:.6f}s"
        if self.logger is not None:
            self.logger.info(msg)
        elif self.verbose:
            logging.info(msg)


def logtofile(logstr):
    """Redirect stdout to a file (data_output_utils.py:375-388)."""
    print(f"log goes to {logstr}")
    sys.stdout = open(logstr, "a", 1)
