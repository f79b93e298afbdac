from audiopure_tpu.data.datasets import (  # noqa: F401
    CLASSES,
    SC09_CLASSES,
    BackgroundNoiseDataset,
    QualcommKeywordSpottingDataset,
    SC09Dataset,
    SpeechCommandsDataset,
)
from audiopure_tpu.data.loader import (BucketedDataLoader,  # noqa: F401
                                       DataLoader)
from audiopure_tpu.data.wavio import read_wav, write_wav  # noqa: F401
