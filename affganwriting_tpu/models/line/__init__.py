from affganwriting_tpu.models.line.hwr import CRNN, CNNOnlyHWR
from affganwriting_tpu.models.line.spaced_gen import SpacedGenerator
from affganwriting_tpu.models.line.count_cnn import CountCNN
from affganwriting_tpu.models.line.char_style import CharStyleEncoder
from affganwriting_tpu.models.line.discriminator import DiscriminatorAP
from affganwriting_tpu.models.line.autoencoder import Autoencoder
from affganwriting_tpu.models.line.container import HWWithStyle

__all__ = [
    "CRNN", "CNNOnlyHWR", "SpacedGenerator", "CountCNN",
    "CharStyleEncoder", "DiscriminatorAP", "Autoencoder", "HWWithStyle",
]
