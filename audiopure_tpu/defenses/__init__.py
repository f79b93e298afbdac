from audiopure_tpu.defenses.time_defense import TimeDomainDefense  # noqa
from audiopure_tpu.defenses.freq_defense import FreqDomainDefense  # noqa
