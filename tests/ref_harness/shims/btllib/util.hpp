// Shim btllib/util.hpp (included by goldrush_path.cpp, unused).
#ifndef SHIM_BTLLIB_UTIL_HPP
#define SHIM_BTLLIB_UTIL_HPP

#endif
