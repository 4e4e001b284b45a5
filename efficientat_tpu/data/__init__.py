from efficientat_tpu.data.audio_io import load_waveform, resample

__all__ = ["load_waveform", "resample"]
