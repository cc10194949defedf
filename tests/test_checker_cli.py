"""Our checker CLI vs the reference's original check.py: same verdicts,
same numeric lines, same exit codes, on identical inputs."""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

ORIG = os.path.join(REFERENCE_DIR, "check", "check.py")


def write_outputs(tmp_path, av, fs_pressure, prefix):
    av_path = tmp_path / f"{prefix}_av.dat"
    fs_path = tmp_path / f"{prefix}_fs.dat"
    with open(av_path, "w") as fh:
        for i, v in enumerate(av):
            fh.write(f"{i}:\t{v:.12E}\n")
    with open(fs_path, "w") as fh:
        n = len(fs_pressure)
        for i, p in enumerate(fs_pressure):
            fh.write(f"{i % n} 0 0.0E+00 0.0E+00 0.0E+00 {p:.12E} 0\n")
    return av_path, fs_path


def run_checker(cmd_prefix, ref_av, ref_fs, av, fs):
    proc = subprocess.run(
        cmd_prefix
        + [
            f"--ref-av-vels-file={ref_av}",
            f"--ref-final-state-file={ref_fs}",
            f"--av-vels-file={av}",
            f"--final-state-file={fs}",
        ],
        capture_output=True,
        text=True,
    )
    return proc.returncode, proc.stdout


@requires_reference
@pytest.mark.parametrize("scale,expect_pass", [(1.0 + 1e-6, True), (1.05, False)])
def test_same_verdict_and_exit_code(tmp_path, scale, expect_pass):
    rng = np.random.RandomState(0)
    av = rng.uniform(1e-5, 1e-2, 50)
    fs = rng.uniform(0.03, 0.04, 64)
    ref_av, ref_fs = write_outputs(tmp_path, av, fs, "ref")
    sim_av, sim_fs = write_outputs(tmp_path, av * scale, fs * scale, "sim")

    rc_orig, out_orig = run_checker(
        [sys.executable, ORIG], ref_av, ref_fs, sim_av, sim_fs
    )
    rc_ours, out_ours = run_checker(
        [sys.executable, "-m", "advanced_hpc_lbm_tpu.utils.check"],
        ref_av, ref_fs, sim_av, sim_fs,
    )
    assert rc_ours == rc_orig == (0 if expect_pass else 1)
    # the whole report is byte-identical (incl. the "at coord (jj,ii)"
    # final-state locator, check/check.py:121-127)
    assert out_ours == out_orig


@requires_reference
def test_argfile_invocation_matches_original(tmp_path):
    """@argfile expansion (fromfile_prefix_chars, check/check.py:13): both
    checkers accept their whole argv from a file and agree."""
    rng = np.random.RandomState(1)
    av = rng.uniform(1e-5, 1e-2, 20)
    fs = rng.uniform(0.03, 0.04, 32)
    ref_av, ref_fs = write_outputs(tmp_path, av, fs, "ref")
    sim_av, sim_fs = write_outputs(tmp_path, av, fs, "sim")
    argfile = tmp_path / "args.txt"
    argfile.write_text(
        f"--ref-av-vels-file={ref_av}\n"
        f"--ref-final-state-file={ref_fs}\n"
        f"--av-vels-file={sim_av}\n"
        f"--final-state-file={sim_fs}\n"
    )

    proc_orig = subprocess.run(
        [sys.executable, ORIG, f"@{argfile}"], capture_output=True, text=True
    )
    proc_ours = subprocess.run(
        [sys.executable, "-m", "advanced_hpc_lbm_tpu.utils.check",
         f"@{argfile}"],
        capture_output=True, text=True,
    )
    assert proc_ours.returncode == proc_orig.returncode == 0
    assert proc_ours.stdout == proc_orig.stdout
