/* No-op OpenGL stub so the reference's core integrator sources compile
 * headless (this container has no GL/X11 dev packages).  Only the symbols
 * the pt31-core files actually reference are stubbed; every call is a
 * no-op — the oracle never opens a window or draws.
 */
#ifndef PD_ORACLE_GLEW_STUB_H
#define PD_ORACLE_GLEW_STUB_H

typedef float GLfloat;
typedef double GLdouble;
typedef unsigned int GLuint;
typedef int GLint;
typedef unsigned int GLenum;
typedef unsigned char GLboolean;
typedef int GLsizei;
typedef void GLvoid;

#define GL_DOUBLE 0x140A
#define GL_LIGHTING 0x0B50
#define GL_LINES 0x0001
#define GL_LINE_LOOP 0x0002
#define GL_LINE_STRIP 0x0003
#define GL_MODELVIEW 0x1700
#define GL_NORMALIZE 0x0BA1
#define GL_NORMAL_ARRAY 0x8075
#define GL_POLYGON 0x0009
#define GL_TRIANGLES 0x0004
#define GL_UNSIGNED_INT 0x1405
#define GL_VERTEX_ARRAY 0x8074

static inline void glBegin(GLenum) {}
static inline void glEnd() {}
static inline void glColor3fv(const GLfloat*) {}
static inline void glColor4f(GLfloat, GLfloat, GLfloat, GLfloat) {}
static inline void glDisable(GLenum) {}
static inline void glEnable(GLenum) {}
static inline void glEnableClientState(GLenum) {}
static inline void glDisableClientState(GLenum) {}
static inline void glDrawElements(GLenum, GLsizei, GLenum, const void*) {}
static inline GLboolean glIsEnabled(GLenum) { return 0; }
static inline void glMatrixMode(GLenum) {}
static inline void glNormal3dv(const GLdouble*) {}
static inline void glNormalPointer(GLenum, GLsizei, const void*) {}
static inline void glPopMatrix() {}
static inline void glPushMatrix() {}
static inline void glScaled(GLdouble, GLdouble, GLdouble) {}
static inline void glTranslated(GLdouble, GLdouble, GLdouble) {}
static inline void glVertex3d(GLdouble, GLdouble, GLdouble) {}
static inline void glVertex3dv(const GLdouble*) {}
static inline void glVertexPointer(GLint, GLenum, GLsizei, const void*) {}

#endif
