"""Orbax-backed trainer-state checkpointing roundtrip."""
import numpy as np

from cs304_tpu.utils.checkpoint import load_trainer_state, save_trainer_state


def test_orbax_roundtrip(tmp_path, rng):
    state = {
        "means_g": rng.normal(size=(3, 5, 4)).astype(np.float32),
        "covs_g": rng.normal(size=(3, 5, 4, 4)).astype(np.float32),
        "iteration": np.int32(7),
    }
    folder = str(tmp_path / "ckpt")
    save_trainer_state(state, folder)
    loaded = load_trainer_state(folder)
    np.testing.assert_array_equal(loaded["means_g"], state["means_g"])
    np.testing.assert_array_equal(loaded["covs_g"], state["covs_g"])
    assert int(loaded["iteration"]) == 7
