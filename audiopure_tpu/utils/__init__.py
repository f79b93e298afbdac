from audiopure_tpu.utils.artifacts import (  # noqa: F401
    audio_save,
    audio_save_as_img,
    spec_save,
)
