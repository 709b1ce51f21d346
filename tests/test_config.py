import pytest

from cnmnet_tpu.config import Config, apply_overrides, load_config, to_dict


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = Config()
        # configs/config.yaml parity
        assert cfg.train.seed == 123
        assert cfg.train.num_epochs == 100
        assert cfg.model.idepth_scale == 3.0
        assert cfg.model.k_size == 9
        assert cfg.solver.method == "adam"
        assert cfg.solver.lr == 1e-4
        assert cfg.solver.weight_decay == 1e-5
        assert cfg.dataset.image_width == 256
        assert cfg.dataset.image_height == 192
        assert cfg.train.prob_weight == 20.0

    def test_dotted_overrides(self):
        cfg = Config()
        apply_overrides(
            cfg,
            ["dataset.batch_size=5", "solver.lr=0.001", "model.norm=group",
             "train.use_normal_loss=false"],
        )
        assert cfg.dataset.batch_size == 5
        assert cfg.solver.lr == pytest.approx(1e-3)
        assert cfg.model.norm == "group"
        assert cfg.train.use_normal_loss is False

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            apply_overrides(Config(), ["dataset.nope=1"])

    def test_yaml_roundtrip(self, tmp_path):
        import yaml

        cfg = Config()
        cfg.dataset.batch_size = 7
        path = tmp_path / "cfg.yaml"
        path.write_text(yaml.safe_dump(to_dict(cfg)))
        loaded = load_config(str(path))
        assert loaded.dataset.batch_size == 7
        assert loaded.solver.lr == cfg.solver.lr
