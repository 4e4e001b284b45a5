from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram

__all__ = ["kaldi_mel_banks", "MelConfig", "log_mel_spectrogram"]
