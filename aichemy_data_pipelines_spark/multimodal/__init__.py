"""Multimodal (image/audio/video) column plumbing — see codecs.py."""
