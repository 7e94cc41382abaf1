"""Fixture loader + acceptance gate coverage: generate a small fixture in the
reference's on-disk format, run the full-benchmark driver against it, and
assert the expected-result check actually fires (both pass and fail paths).

Reference analogue: src/test-data/testCases.ts:34-52 loadTestCase feeding
full_benchmarks.ts:77-81's mismatch warning.  The original ZPrize fixture
files are LFS-stripped everywhere, so CI exercises the same code path with a
generated fixture + oracle sidecar expected result."""

import os

import pytest

from webgpu_msm_twisted_edwards_tpu.benchmarks import full
from webgpu_msm_twisted_edwards_tpu.utils import oracle, test_data


@pytest.mark.skipif(not oracle.available(), reason="liboracle.so not built")
def test_fixture_roundtrip_and_gate(tmp_path):
    base = str(tmp_path)
    power = 8
    tc = test_data.make_fixture(power, seed=5, base_dir=base)
    assert test_data.available(power, base)

    # Loader round-trip: same points/scalars/expected come back.
    tc2 = test_data.load_test_case(power, base)
    assert tc2.points == tc.points
    assert tc2.scalars == tc.scalars
    assert tuple(tc2.expected) == tuple(tc.expected)

    # The gate fires "yes" on the correct expected result...
    table = full.run(powers=(power,), runs=1, check=True, base_dir=base)
    assert table.rows[-1][1] == "fixture"
    assert table.rows[-1][-1] == "yes", table.markdown()

    # ...and "NO" when the sidecar expected result is tampered with.
    with open(os.path.join(base, f"{power}-power-expected.txt"), "w") as f:
        f.write("1 2\n")
    table = full.run(powers=(power,), runs=1, check=True, base_dir=base)
    assert table.rows[-1][-1] == "NO", table.markdown()


def test_published_constants_wired():
    """The published ZPrize expected constants stay wired for 2^16..2^20
    (reference: testCases.ts:11-32); the loader attaches them only when no
    generated-fixture sidecar is present."""
    assert set(test_data.EXPECTED_RESULTS) == {16, 17, 18, 19, 20}
    for x, y in test_data.EXPECTED_RESULTS.values():
        assert 0 < x and 0 < y
