from affganwriting_tpu.models.generator import Generator
from affganwriting_tpu.models.discriminator import Discriminator
from affganwriting_tpu.models.writer_cla import WriterClassifier
from affganwriting_tpu.models.recognizer.seq2seq import Recognizer

__all__ = ["Generator", "Discriminator", "WriterClassifier", "Recognizer"]
