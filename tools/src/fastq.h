// FASTQ read/write (plain / gzip / BGZF) for the dataset-curation tools.
#pragma once

#include <string>
#include <vector>

#include "bgzf.h"

namespace chimera {

struct FastqRecord {
  std::string name;     // without '@', without comment
  std::string comment;  // after first space, may be empty
  std::string seq;
  std::string qual;
};

// Reads an entire FASTQ file (zlib gzopen handles plain+gzip+bgzf).
std::vector<FastqRecord> ReadFastq(const std::string& path);

// Writes records; bgzip-compressed when path ends with .gz.
void WriteFastq(const std::vector<FastqRecord>& records, const std::string& path, int threads);

}  // namespace chimera
