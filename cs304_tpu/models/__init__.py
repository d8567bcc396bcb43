"""Model layer: word HMMs, composite decoding, trainers, DTW, collections."""
