/* Minimal CPython extension for the native scalar propagator: the
 * per-call path (api.Satrec.sgp4 in a loop) is overhead-bound — ctypes
 * costs ~3.7 us/call in marshalling while the propagation itself is
 * ~0.3 us. This module builds the (e, (x,y,z), (vx,vy,vz)) result
 * tuples in C (reference: the hand-rolled CPython layer serving its
 * 2.5M props/s scalar loop, bindings/python/src/satrec.zig:169-201).
 *
 * Compiled alongside libastroz_native.so by native/_build (plain
 * Python.h, no pybind11/setuptools).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#ifdef __cplusplus
extern "C"
#endif
int astroz_scalar_sgp4(const double* s, double tsince, double* out6);

/* propagate(vec_addr: int, tsince: float) -> (e, (x,y,z), (vx,vy,vz))
 * vec_addr is the data pointer of the packed element vector (owned and
 * kept alive by the Python-side ScalarEngine). */
static PyObject* propagate(PyObject* self, PyObject* const* args,
                           Py_ssize_t nargs) {
  if (nargs != 2) {
    PyErr_SetString(PyExc_TypeError, "propagate(vec_addr, tsince_min)");
    return NULL;
  }
  unsigned long long addr = PyLong_AsUnsignedLongLong(args[0]);
  double tsince = PyFloat_AsDouble(args[1]);
  if (PyErr_Occurred()) return NULL;
  double out[6];
  int e = astroz_scalar_sgp4((const double*)(uintptr_t)addr, tsince, out);
  return Py_BuildValue("i(ddd)(ddd)", e, out[0], out[1], out[2],
                       out[3], out[4], out[5]);
}

static PyMethodDef methods[] = {
    {"propagate", (PyCFunction)(void (*)(void))propagate, METH_FASTCALL,
     "propagate(vec_addr, tsince_min) -> (e, r, v)"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_astroz_scalar",
    "Native scalar SGP4/SDP4 single-point propagator.", -1, methods};

PyMODINIT_FUNC PyInit__astroz_scalar(void) {
  return PyModule_Create(&moduledef);
}
