// Shim btllib/seq_writer.hpp (included by goldrush_path.cpp, unused).
#ifndef SHIM_BTLLIB_SEQ_WRITER_HPP
#define SHIM_BTLLIB_SEQ_WRITER_HPP

namespace btllib {
class SeqWriter
{};
}

#endif
