"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is tested without real hardware via XLA's host-platform
device-count override (SURVEY.md §4) — the same mechanism the driver uses for
dryrun_multichip.
"""

import os

# The environment may pre-set JAX_PLATFORMS to the TPU backend (and a
# sitecustomize can re-add it); tests always run on the virtual CPU mesh
# unless NEXTSEARCH_TEST_TPU=1 opts into real hardware. jax.config.update
# wins over both as long as no backend has been initialized yet.
if os.environ.get("NEXTSEARCH_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

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
