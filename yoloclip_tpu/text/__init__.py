from yoloclip_tpu.text.tokenizer import CLIPTokenizer  # noqa: F401
from yoloclip_tpu.text.encoder import CLIPTextEncoder  # noqa: F401
from yoloclip_tpu.text.vocab import VocabularyBuilder  # noqa: F401
