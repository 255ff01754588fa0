"""Pinned BPE merge table for ``bpe_encoded_token_counts``.

Trained by tools/pin_bpe.py on /root/testdata/sf0.01 documents with
n_merges=48 (operators/bpe.py:train_bpe — deterministic).
tests/test_bpe.py asserts a fresh fit still reproduces these
merges. Regenerate with: python tools/pin_bpe.py
"""

_BPE_SF_DIR = '/root/testdata/sf0.01'
_BPE_N_MERGES = 48
_BPE_MERGES = [
    ('e', 'r'),
    ('e', '</w>'),
    ('n', '</w>'),
    ('er', '</w>'),
    ('o', 'w'),
    ('ow', '</w>'),
    ('o', 'r'),
    ('s', 't'),
    ('h', '</w>'),
    ('a', 't'),
    ('l', 'u'),
    ('i', 'n'),
    ('a', '</w>'),
    ('g', '</w>'),
    ('y', '</w>'),
    ('a', 'r'),
    ('p', 'ar'),
    ('t', '</w>'),
    ('i', 'n</w>'),
    ('j', 'o'),
    ('jo', 'in</w>'),
    ('a', 's'),
    ('as', 'h</w>'),
    ('h', 'ash</w>'),
    ('r', 'ow</w>'),
    ('at', 'c'),
    ('atc', 'h</w>'),
    ('b', 'atch</w>'),
    ('a', 'n</w>'),
    ('c', 'an</w>'),
    ('s', 'can</w>'),
    ('c', 'o'),
    ('c', 'u'),
    ('co', 'lu'),
    ('colu', 'm'),
    ('colum', 'n</w>'),
    ('cu', 'st'),
    ('cust', 'o'),
    ('custo', 'm'),
    ('custom', 'er</w>'),
    ('f', 'i'),
    ('fi', 'l'),
    ('fil', 't'),
    ('filt', 'er</w>'),
    ('a', 'l'),
    ('al', 'l'),
    ('all', '</w>'),
    ('m', 'all</w>'),
]
