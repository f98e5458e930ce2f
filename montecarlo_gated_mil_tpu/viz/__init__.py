from montecarlo_gated_mil_tpu.viz.attention import (  # noqa: F401
    attention_map_stats,
    membership_matrices,
    reconstruct_attention_maps,
    reconstruct_image_from_patches,
)
from montecarlo_gated_mil_tpu.viz.figures import plot_attention_and_density  # noqa: F401
