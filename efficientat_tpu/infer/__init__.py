from efficientat_tpu.infer.tag import Tagger
from efficientat_tpu.infer.windowed import tag_audio_window

__all__ = ["Tagger", "tag_audio_window"]
