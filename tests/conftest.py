"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is tested without real hardware via XLA's host-platform
device-count override (SURVEY.md §4) — the same mechanism the driver uses for
dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_synthetic_docs(n_docs: int, vocab: int, seed: int = 0, avg_len: int = 60):
    """Zipf-ish synthetic corpus with CORD-style doc dicts."""
    r = np.random.default_rng(seed)
    words = [f"w{i:04d}" for i in range(vocab)]
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.1
    probs /= probs.sum()
    docs = []
    for i in range(n_docs):
        length = max(1, int(r.poisson(avg_len)))
        toks = r.choice(vocab, size=length, p=probs)
        docs.append(
            {
                "cord_uid": f"uid{i:05d}",
                "title": f"title {i}",
                "relpath": f"doc/{i}.json",
                "tokens": [words[t] for t in toks],
            }
        )
    return docs


@pytest.fixture(scope="session")
def synthetic_docs():
    return make_synthetic_docs(200, 300, seed=1)
