from tstar_tpu.models.owlvit import (  # noqa: F401
    OwlViTConfig,
    OwlViTDetector,
    convert_hf_owlvit_state_dict,
    owlvit_base_patch32,
)
