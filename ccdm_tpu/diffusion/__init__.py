from ccdm_tpu.diffusion.categorical import (
    CategoricalDiffusion,
    q_xt_given_x0_probs,
    q_xt_given_xtm1_probs,
    theta_post,
    theta_post_prob,
    theta_post_prob_naive,
    categorical_kl,
    sample_categorical,
    sample_categorical_icdf,
    sample_onehot,
    max_prob_onehot,
)
from ccdm_tpu.diffusion.sampling import SamplerConfig, ancestral_sampler, subsampled_t_values

__all__ = [
    "CategoricalDiffusion",
    "q_xt_given_x0_probs",
    "q_xt_given_xtm1_probs",
    "theta_post",
    "theta_post_prob",
    "theta_post_prob_naive",
    "categorical_kl",
    "sample_categorical",
    "sample_categorical_icdf",
    "sample_onehot",
    "max_prob_onehot",
    "SamplerConfig",
    "ancestral_sampler",
    "subsampled_t_values",
]
