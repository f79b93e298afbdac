from audiopure_tpu.attacks.eot import EOT  # noqa: F401
from audiopure_tpu.attacks.pgd import AudioAttack  # noqa: F401
from audiopure_tpu.attacks.losses import (  # noqa: F401
    cross_entropy,
    margin_loss,
    resolve_loss,
)
