"""Config schema tests: finalization, validation, YAML round-trip, and
compatibility with the reference's YAML files."""

import pytest
import yaml

from xkv_tpu.configs import (
    LayerGroup,
    XKVConfig,
    generate_consecutive_layer_groups,
    generate_consecutive_xkv_config,
)


def test_svd_finalization_fills_global_defaults():
    cfg = XKVConfig(
        layer_merge_impl="svd",
        rank_k=128,
        rank_v=64,
        layer_groups=[
            LayerGroup(layers=[0, 1], rank_k=256),
            LayerGroup(layers=[2, 3]),
        ],
    )
    assert cfg.layer_groups[0].rank_k == 256
    assert cfg.layer_groups[0].rank_v == 64
    assert cfg.layer_groups[1].rank_k == 128
    # slerp params nulled for svd
    assert cfg.layer_groups[0].slerp_t is None


def test_slerp_finalization():
    cfg = XKVConfig(
        layer_merge_impl="slerp",
        slerp_t=0.7,
        slerp_gamma=0.1,
        layer_groups=[LayerGroup(layers=[4, 5], slerp_t=0.9)],
    )
    grp = cfg.layer_groups[0]
    assert grp.slerp_t == 0.9
    assert grp.slerp_gamma == 0.1
    assert grp.rank_k is None


def test_slerp_requires_pairs():
    with pytest.raises(ValueError):
        XKVConfig(
            layer_merge_impl="slerp",
            layer_groups=[LayerGroup(layers=[0, 1, 2])],
        )


def test_duplicate_layer_rejected():
    with pytest.raises(ValueError):
        XKVConfig(
            rank_k=8,
            rank_v=8,
            layer_groups=[LayerGroup(layers=[0, 1]), LayerGroup(layers=[1, 2])],
        )


def test_num_layers_validation():
    with pytest.raises(ValueError):
        XKVConfig(
            num_layers=2, rank_k=8, rank_v=8, layer_groups=[LayerGroup(layers=[1, 2])]
        )


def test_group_lookup_helpers():
    cfg = generate_consecutive_xkv_config(
        num_layers=8, end_layer=7, group_size=4, rank_k=16, rank_v=16
    )
    assert cfg.get_group_for_layer(5).layers == [4, 5, 6, 7]
    assert cfg.is_group_last(3)
    assert not cfg.is_group_last(2)
    assert cfg.is_grouped(0)
    assert cfg.get_group_for_layer(99) is None


def test_consecutive_groups_remainder():
    groups = generate_consecutive_layer_groups(0, 5, 4)
    assert [g.layers for g in groups] == [[0, 1, 2, 3], [4, 5]]


def test_end_layer_minus_one_uses_num_layers():
    cfg = generate_consecutive_xkv_config(
        num_layers=6, end_layer=-1, group_size=2, rank_k=4, rank_v=4
    )
    assert cfg.layer_groups[-1].layers == [4, 5]


def test_yaml_round_trip(tmp_path):
    cfg = generate_consecutive_xkv_config(
        num_layers=8,
        end_layer=7,
        group_size=2,
        rank_k=32,
        rank_v=48,
        extra_kwargs={"svd_method": "exact"},
    )
    path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(path)
    loaded = XKVConfig.from_yaml(path)
    assert loaded.rank_k == 32
    assert loaded.svd_method == "exact"
    assert [g.layers for g in loaded.layer_groups] == [g.layers for g in cfg.layer_groups]


def test_reference_schema_yaml_loads(tmp_path):
    """A YAML in the reference's exact schema (reference configs/example.yaml
    structure) must load unchanged."""
    raw = {
        "xKV_config": {
            "num_layers": 32,
            "layer_merge_impl": "svd",
            "rank_k": 512,
            "rank_v": 768,
            "slerp_t": 0.5,
            "slerp_gamma": 1.0,
            "merge_key": True,
            "merge_value": True,
            "layer_groups": [
                {"layers": [0, 1, 2, 3]},
                {"layers": [4, 5, 6, 7], "rank_k": 256},
            ],
        }
    }
    path = tmp_path / "ref.yaml"
    path.write_text(yaml.safe_dump(raw))
    cfg = XKVConfig.from_yaml(str(path))
    assert cfg.layer_groups[1].rank_k == 256
    assert cfg.layer_groups[0].rank_v == 768
    assert cfg.num_layers == 32


def test_unknown_keys_go_to_extra_kwargs(tmp_path):
    raw = {
        "xKV_config": {
            "layer_merge_impl": "svd",
            "rank_k": 8,
            "rank_v": 8,
            "future_flag": 123,
            "layer_groups": [{"layers": [0]}],
        }
    }
    path = tmp_path / "x.yaml"
    path.write_text(yaml.safe_dump(raw))
    cfg = XKVConfig.from_yaml(str(path))
    assert cfg.extra_kwargs["future_flag"] == 123
    # and it round-trips back out
    cfg.to_yaml(str(path))
    again = XKVConfig.from_yaml(str(path))
    assert again.extra_kwargs["future_flag"] == 123
