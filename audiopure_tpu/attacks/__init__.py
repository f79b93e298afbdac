from audiopure_tpu.attacks.bpda import bpda  # noqa: F401
from audiopure_tpu.attacks.eot import EOT  # noqa: F401
from audiopure_tpu.attacks.fakebob import FAKEBOB  # noqa: F401
from audiopure_tpu.attacks.kenansville import KenansvilleAttack  # noqa: F401
from audiopure_tpu.attacks.losses import (  # noqa: F401
    cross_entropy,
    margin_loss,
    resolve_loss,
)
from audiopure_tpu.attacks.nes import NES  # noqa: F401
from audiopure_tpu.attacks.pgd import AudioAttack  # noqa: F401
from audiopure_tpu.attacks.spsa import LinfSPSA  # noqa: F401
from audiopure_tpu.attacks.square import SquareAttack  # noqa: F401
from audiopure_tpu.attacks.siren import SirenAttack  # noqa: F401
