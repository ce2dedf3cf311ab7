from affganwriting_tpu.models.recognizer.seq2seq import Recognizer

__all__ = ["Recognizer"]
