"""Phoneme id inventory (43 SAMPA phonemes; id 0..42, with 0 reserved for
silence *in features* by shifting ids +1 there).

Data parity with the reference inventory (bm/lib/phonemes/phonemes.json) —
the id mapping must match so cached events and trained checkpoints agree
on phoneme classes.
"""

ph_dict = {
    "d": 0, "@": 1, "b": 2, "A": 3, "n": 4, "s": 5, "i": 6, "E": 7, "r": 8,
    "x": 9, "p": 10, "o:": 11, "y": 12, "l": 13, "E:": 14, "Ei": 15, "N": 16,
    "e:": 17, "O": 18, "m": 19, "t": 20, "I": 21, "G": 22, "w": 23, "k": 24,
    "h": 25, "v": 26, "j": 27, "a:": 28, "u": 29, "z": 30, "Y": 31, "f": 32,
    "9y": 33, "S": 34, "ui": 35, "Au": 36, "Z": 37, "9:": 38, "2:": 39,
    "g": 40, "J": 41, "O:": 42,
}
