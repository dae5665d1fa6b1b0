from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (per task instructions).

    autouse: a test module that builds a Dataset WITHOUT requesting this
    fixture would otherwise let Ray Data auto-init with every host CPU,
    and the whole session (ignore_reinit_error) would inherit that — the
    r3 order-dependent test_web/test_ops failure."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_images_table(tmp_path_factory):
    """Tiny deterministic synthetic images table written once per session."""
    from idf.synth import generate_images_table, write_images_table

    out = tmp_path_factory.mktemp("imgs") / "images.parquet"
    tbl = generate_images_table(n_families=6, seed=7)
    write_images_table(tbl, str(out))
    return str(out)
