"""Pinned golden-count conformance (A3): the engine's end-to-end
aggregates over the deterministic corpus must equal the committed
goldens — protects against the generator and engine drifting together
(the oracle tests alone can't catch that)."""

import json
import os

from d1_log_aggregation_ray.gen.fixtures import GEN_VERSION
from d1_log_aggregation_ray.pipelines.harvest import run_harvest

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden_counts.json")))


def test_gen_version_matches_goldens():
    assert GOLDEN["gen_version"] == GEN_VERSION, (
        "generator changed: recompute tests/golden_counts.json via engine "
        "AND pandas oracle")


def test_golden_counts_sf0001(fx_dir, tmp_path):
    s = run_harvest(fx_dir, str(tmp_path / "out"), resume=False)
    g = GOLDEN["sf0.001"]
    for k, v in g.items():
        assert s[k] == v, f"{k}: engine {s[k]} != golden {v}"
