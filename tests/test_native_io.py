"""Native C codec vs pure-Python differential tests (skipped when no cc)."""

import numpy as np
import pytest

import advanced_hpc_lbm_tpu.utils.native as native
from advanced_hpc_lbm_tpu.params import LBMParams
from advanced_hpc_lbm_tpu.utils import io as lbm_io


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("no C toolchain for libfastio")


@pytest.fixture()
def params():
    return LBMParams(64, 64, 1, 10, 0.1, 0.005, 1.85)


class TestNativeObstacleParser:
    def test_matches_python(self, params, tmp_path, monkeypatch):
        rng = np.random.RandomState(2)
        lines = []
        seen = set()
        for _ in range(200):
            x, y = rng.randint(0, 64), rng.randint(0, 64)
            seen.add((x, y))
            lines.append(f"{x} {y} 1\n")
        deck = tmp_path / "obs.dat"
        deck.write_text("".join(lines) + "\n")  # trailing blank line

        fast = native.parse_obstacles(deck, 64, 64)
        assert fast is not None
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_failed", True)
        slow = lbm_io.load_obstacles(deck, params)
        np.testing.assert_array_equal(fast, slow)
        assert fast.sum() == len(seen)

    @pytest.mark.parametrize(
        "content,msg",
        [
            ("1 2\n", "3 values"),
            ("99 0 1\n", "x-coord"),
            ("0 99 1\n", "y-coord"),
            ("0 0 2\n", "blocked"),
            ("0 0 1 junk\n", "3 values"),
        ],
    )
    def test_error_messages(self, params, tmp_path, content, msg):
        deck = tmp_path / "bad.dat"
        deck.write_text(content)
        with pytest.raises(ValueError, match=msg):
            native.parse_obstacles(deck, 64, 64)

    def test_error_line_number(self, tmp_path):
        deck = tmp_path / "bad.dat"
        deck.write_text("1 1 1\n2 2 1\nbogus line here\n")
        with pytest.raises(ValueError, match=r":3"):
            native.parse_obstacles(deck, 64, 64)

    def test_missing_file(self):
        with pytest.raises(OSError, match="could not open"):
            native.parse_obstacles("/nonexistent/x.dat", 8, 8)
