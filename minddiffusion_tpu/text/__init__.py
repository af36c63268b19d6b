from minddiffusion_tpu.text.bpe_clip import ClipBpeTokenizer
from minddiffusion_tpu.text.wordpiece_zh import WordpieceZhTokenizer

__all__ = ["ClipBpeTokenizer", "WordpieceZhTokenizer"]
