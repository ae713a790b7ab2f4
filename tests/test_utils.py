"""utils/: checkpoint save/load round-trip (atomic), config YAML loading
(the reference documents config/default.yaml but never parses it —
SURVEY §5; here it is real)."""

import numpy as np
import pytest


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from vfisr_tpu.utils.checkpoint import load_params, save_params

        params = {"layer": {"kernel": np.arange(12.0).reshape(3, 4),
                            "bias": np.zeros(4)},
                  "head": {"w": np.ones((2, 2), np.float32)}}
        path = str(tmp_path / "m.npz")
        save_params(path, params)
        out = load_params(path, like=params)
        assert np.array_equal(out["layer"]["kernel"], params["layer"]["kernel"])
        assert out["head"]["w"].dtype == np.float32
        # atomic write: no .tmp remnants
        assert list(tmp_path.glob("*.tmp*")) == []

    def test_structure_mismatch_raises(self, tmp_path):
        from vfisr_tpu.utils.checkpoint import load_params, save_params

        path = str(tmp_path / "m.npz")
        save_params(path, {"a": np.zeros(3)})
        with pytest.raises(ValueError):
            load_params(path, like={"a": np.zeros(3), "b": np.zeros(2)})

    def test_overwrite_existing(self, tmp_path):
        from vfisr_tpu.utils.checkpoint import load_params, save_params

        path = str(tmp_path / "m.npz")
        save_params(path, {"a": np.zeros(3)})
        save_params(path, {"a": np.ones(3)})  # save-every-N overwrites
        assert np.array_equal(load_params(path)["a"], np.ones(3))


class TestConfig:
    def test_default_yaml_loads(self):
        from vfisr_tpu.utils.config import load_config

        cfg = load_config()
        assert isinstance(cfg, dict) and cfg  # the YAML is actually parsed

    def test_overrides_deep_merge(self):
        from vfisr_tpu.utils.config import load_config

        base = load_config()
        key = next(k for k, v in base.items() if isinstance(v, dict))
        sub = next(iter(base[key]))
        cfg = load_config(overrides={key: {sub: "OVERRIDDEN"}})
        assert cfg[key][sub] == "OVERRIDDEN"
        # sibling keys survive the merge
        assert set(base[key]) == set(cfg[key])
