// Shim btllib/seq_reader.hpp: minimal FASTQ/FASTA reader with the API surface
// used by goldrush_path.cpp, read_hashing.cpp and ntcard.hpp:
//   - SeqReader(path, Flag::LONG_MODE), get_format(), get_block_size()
//   - shared-stream range-for iteration (each iterator pulls distinct records
//     under a lock, like btllib's parallel reader)
//   - read_block() -> OrderQueueMPMC<Record>::Block
// Block size is 1: every reader block holds one record, so the hash workers
// (read_hashing.cpp:57-73) write exactly one hash block per reader block num
// and never hit the partial-flush path — ordering is total and deterministic.
#ifndef SHIM_BTLLIB_SEQ_READER_HPP
#define SHIM_BTLLIB_SEQ_READER_HPP

#include "order_queue.hpp"

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <mutex>
#include <string>

namespace btllib {

class SeqReader
{
public:
  struct Record
  {
    size_t num = 0;
    std::string id;
    std::string comment;
    std::string seq;
    std::string qual;
  };

  enum class Format
  {
    UNDETERMINED,
    FASTA,
    FASTQ
  };

  struct Flag
  {
    static const unsigned SHORT_MODE = 1;
    static const unsigned LONG_MODE = 2;
  };

  static const size_t LONG_MODE_BUFFER_SIZE = 4;
  static const size_t LONG_MODE_BLOCK_SIZE = 1;

  SeqReader(const std::string& path, unsigned flags)
    : m_in(path)
  {
    (void)flags;
    if (!m_in) {
      std::cerr << "shim SeqReader: cannot open " << path << std::endl;
      exit(1);
    }
    if (path.size() > 3 && path.substr(path.size() - 3) == ".gz") {
      std::cerr << "shim SeqReader: gz input not supported" << std::endl;
      exit(1);
    }
    int c = m_in.peek();
    if (c == '@') {
      m_format = Format::FASTQ;
    } else if (c == '>') {
      m_format = Format::FASTA;
    } else {
      m_format = Format::UNDETERMINED;
    }
  }

  Format get_format() const { return m_format; }

  size_t get_block_size() const { return LONG_MODE_BLOCK_SIZE; }

  // Pull one record; returns false at EOF.  Thread-safe.
  bool next(Record& rec)
  {
    std::lock_guard<std::mutex> lk(m_mutex);
    std::string header;
    while (std::getline(m_in, header)) {
      if (!header.empty()) {
        break;
      }
    }
    if (header.empty()) {
      return false;
    }
    rec.num = m_count++;
    size_t sp = header.find_first_of(" \t");
    rec.id = header.substr(1, sp == std::string::npos ? sp : sp - 1);
    rec.comment = sp == std::string::npos ? "" : header.substr(sp + 1);
    if (m_format == Format::FASTQ) {
      std::string plus;
      if (!std::getline(m_in, rec.seq) || !std::getline(m_in, plus) ||
          !std::getline(m_in, rec.qual)) {
        return false;
      }
    } else {
      rec.seq.clear();
      rec.qual.clear();
      while (m_in.peek() != '>' && m_in.peek() != EOF) {
        std::string line;
        if (!std::getline(m_in, line)) {
          break;
        }
        rec.seq += line;
      }
    }
    return true;
  }

  OrderQueueMPMC<Record>::Block read_block()
  {
    OrderQueueMPMC<Record>::Block block(LONG_MODE_BLOCK_SIZE);
    Record rec;
    if (next(rec)) {
      block.num = rec.num;
      block.data[0] = std::move(rec);
      block.count = 1;
    } else {
      block.count = 0;
    }
    return block;
  }

  class iterator
  {
  public:
    iterator() = default;
    explicit iterator(SeqReader* r)
      : m_reader(r)
    {
      advance();
    }
    const Record& operator*() const { return m_rec; }
    iterator& operator++()
    {
      advance();
      return *this;
    }
    bool operator!=(const iterator& other) const
    {
      return m_has != other.m_has;
    }

  private:
    void advance()
    {
      m_has = m_reader != nullptr && m_reader->next(m_rec);
    }
    SeqReader* m_reader = nullptr;
    Record m_rec;
    bool m_has = false;
  };

  iterator begin() { return iterator(this); }
  iterator end() { return iterator(); }

private:
  std::ifstream m_in;
  std::mutex m_mutex;
  Format m_format = Format::UNDETERMINED;
  size_t m_count = 0;
};

} // namespace btllib

#endif
