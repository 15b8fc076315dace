"""Model zoo: HuBERT/wav2vec2 audio encoders, Llama-family LM decoder,
EfficientNet adapter, and the ASLM audio-speech LM composition."""
