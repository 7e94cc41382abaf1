"""Unit tests for the benchmark harness plumbing (Table output, input
staging) — the measurable parts that don't need a TPU."""


from webgpu_msm_twisted_edwards_tpu.benchmarks.timing import Table, median


def test_table_markdown_and_csv(tmp_path):
    t = Table(["a", "b"])
    t.add(1, "x")
    t.add(2, "y")
    md = t.markdown()
    assert md.splitlines()[0] == "| a | b |"
    assert "| 1 | x |" in md and "| 2 | y |" in md
    path = tmp_path / "out.csv"
    t.save_csv(str(path))
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "a,b" and lines[1] == "1,x"


def test_median():
    assert median([3.0, 1.0, 2.0]) == 2.0
    assert median([5.0]) == 5.0


def test_inputs_for_power_prefers_fixture(tmp_path):
    from webgpu_msm_twisted_edwards_tpu.benchmarks.full import _inputs_for_power
    from webgpu_msm_twisted_edwards_tpu.utils import oracle, test_data as TD

    if not oracle.available():
        import pytest

        pytest.skip("liboracle.so not built")
    # Generated fixture carries its own (oracle) expected result, not the
    # published ZPrize constants.
    import webgpu_msm_twisted_edwards_tpu.utils.test_data as td_mod

    old = td_mod.DEFAULT_DIR
    td_mod.DEFAULT_DIR = str(tmp_path)
    try:
        tc = TD.make_fixture(4, seed=9)
        coords, scalars, expected, src = _inputs_for_power(4)
        assert src == "fixture"
        assert expected == tc.expected
        assert coords.shape == (16, 2, 8) and scalars.shape == (16, 8)
        # Round-trip one point through the word packing.
        x = sum(int(coords[0, 0, j]) << (32 * j) for j in range(8))
        assert x == tc.points[0][0]
    finally:
        td_mod.DEFAULT_DIR = old


def test_cli_help_lists_all_subcommands():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "webgpu_msm_twisted_edwards_tpu.benchmarks", "--help"],
        capture_output=True, text=True, timeout=120,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0
    for cmd in ("full", "dashboard", "batch", "sweep", "scaling", "trace", "mont",
                "barrett", "barrett-domb", "convert", "decompose",
                "data-transfer", "add-points", "scalar-mul",
                "bucket-reduction", "horners-rule", "smtvp", "stages",
                "device-info"):
        assert cmd in out.stdout, cmd


def test_run_batch_small():
    """`benchmarks batch` end-to-end at a tiny size: batch and one-shot agree
    and the oracle spot-check passes (full protocol, CPU backend)."""
    from webgpu_msm_twisted_edwards_tpu.benchmarks.full import run_batch
    from webgpu_msm_twisted_edwards_tpu.utils import oracle

    if not oracle.available():
        import pytest

        pytest.skip("liboracle.so not built")
    table = run_batch(power=8, k=2)
    row = table.rows[0]
    assert row[-1] == "yes", row
