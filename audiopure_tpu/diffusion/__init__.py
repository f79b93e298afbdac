from audiopure_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
    diffusion_step_embedding,
    make_schedule,
)
