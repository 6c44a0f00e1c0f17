"""Evaluator dispatch is a dataset-module protocol property, not a name
property (closes the round-2 weakness: `"lidc" in dataset_file` substring
dispatch silently misrouted arbitrarily-named user modules; reference
behavior kept as the fallback, `ddpm_eval.py:39-47`)."""

import sys
import textwrap
import types

from ccdm_tpu.data.registry import is_multi_annotator, resolve_dataset_module


def _module(name, flag=None):
    m = types.ModuleType(name)
    if flag is not None:
        m.is_multi_annotator = lambda: flag
    return m


def test_protocol_flag_wins_over_name():
    # a module whose NAME says nothing about annotators still routes by flag
    assert is_multi_annotator(_module("my_hospital_scans", True)) is True
    # ...and a module whose name SAYS lidc can opt out explicitly
    assert is_multi_annotator(_module("custom_lidc_variant", False),
                              "custom_lidc_variant") is False


def test_name_fallback_matches_reference_substrings():
    # user modules predating the flag: reference dispatch semantics
    assert is_multi_annotator(_module("datasets.lidc"), "datasets.lidc")
    assert is_multi_annotator(_module("my.synthetic_ds"), "my.synthetic_ds")
    assert not is_multi_annotator(_module("datasets.cityscapes"),
                                  "datasets.cityscapes")
    assert not is_multi_annotator(_module("mylidcstyle_other"), "acme.custom")


def test_in_tree_modules_declare_the_flag():
    for name, expected in [("datasets.lidc", True),
                           ("datasets.lidc_orig", True),
                           ("datasets.synthetic", True),
                           ("datasets.cityscapes", False)]:
        mod = resolve_dataset_module(name)
        assert hasattr(mod, "is_multi_annotator"), name
        assert is_multi_annotator(mod, name) is expected


def test_cli_routes_arbitrary_named_module_to_ged_path(tmp_path, monkeypatch):
    """An arbitrarily-named module with the flag takes the GED evaluator."""
    mod_dir = tmp_path / "userpkg"
    mod_dir.mkdir()
    (mod_dir / "acme_scans.py").write_text(textwrap.dedent("""
        from ccdm_tpu.data.synthetic import (  # same data, arbitrary name
            training_dataset, validation_dataset, test_dataset,
            get_num_classes, get_ignore_class)

        def is_multi_annotator():
            return True
    """))
    monkeypatch.syspath_prepend(str(mod_dir))

    import ccdm_tpu.cli.eval as cli_eval

    calls = []
    ged_mod = types.ModuleType("ccdm_tpu.eval.lidc_uncertainty")
    ged_mod.eval_lidc_uncertainty = lambda params: calls.append(("ged", params))
    cs_mod = types.ModuleType("ccdm_tpu.eval.cityscapes_eval")
    cs_mod.run_inference = lambda params: calls.append(("miou", params))
    monkeypatch.setitem(sys.modules, "ccdm_tpu.eval.lidc_uncertainty", ged_mod)
    monkeypatch.setitem(sys.modules, "ccdm_tpu.eval.cityscapes_eval", cs_mod)

    import yaml

    cfg = tmp_path / "params.yml"
    cfg.write_text(yaml.safe_dump({"dataset_file": "acme_scans"}))
    monkeypatch.setattr(sys, "argv", ["ccdm-eval", str(cfg)])
    cli_eval.main()
    assert [c[0] for c in calls] == ["ged"]
