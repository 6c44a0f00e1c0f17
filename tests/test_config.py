"""Config defaults: the evaluation_vote_strategy -> step_T_sample mapping.

Reference: the model is built with
`step_T_sample=params.get('evaluation_vote_strategy', None)`
(`ddpm/trainer.py:599`) and None falls back to majority at the final
sampler step (`diffusion_denoising.py:209`). The mapping must also be
order-independent: CLIs merge defaults before the eval harnesses merge
them again.
"""

from ccdm_tpu.config import with_defaults


def test_vote_strategy_maps_to_step_T_sample():
    p = with_defaults({"evaluation_vote_strategy": "confidence"})
    assert p["step_T_sample"] == "confidence"


def test_vote_strategy_mapping_is_idempotent():
    once = with_defaults({"evaluation_vote_strategy": "confidence"})
    twice = with_defaults(once)
    assert twice["step_T_sample"] == "confidence"


def test_explicit_step_T_sample_wins():
    p = with_defaults({"evaluation_vote_strategy": "confidence",
                       "step_T_sample": "majority"})
    assert p["step_T_sample"] == "majority"


def test_absent_strategy_defaults_to_majority():
    assert with_defaults({})["step_T_sample"] == "majority"
