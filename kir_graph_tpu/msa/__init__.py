from .genemsa import Block, Genemsa, readFromMSAs, saveAllMsa
