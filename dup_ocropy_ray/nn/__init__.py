"""Bidirectional-LSTM + CTC line recognizer (numpy, from scratch)."""
